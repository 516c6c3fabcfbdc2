"""SQL front-end over a SnapCatalog: run Spark SQL against
``db.table`` references with Iceberg's time-travel syntax.

The reference drives everything through ``spark.sql`` over catalog
tables — ``SHOW TABLES IN {cat}.{db}`` (`1_collect_src_snapshots.py:52`),
time-travel reads by snapshot id (`5_migrate_tables_data.py:72-74`),
metadata tables (`1_collect_src_snapshots.py:61-62`) — so a user
switching to this engine needs the same surface: write a query naming
``db.table`` (optionally ``VERSION AS OF <id|'tag'>`` / ``TIMESTAMP
AS OF '<ts>'`` / a ``.snapshots``-style metadata suffix) and get a
DataFrame back.

Mechanics: references are resolved AGAINST THE CATALOG first — only
identifiers that name an existing table are rewritten (an alias like
``o.col`` or a genuine temp view is left alone), each resolved
DataFrame registers as a uniquely-named temp view, and the rewritten
text runs through ``spark.sql`` — so Catalyst still does all parsing,
analysis and optimization; this layer only binds names the way an
Iceberg Spark catalog plugin would. Time travel resolves through the
same `resolve_snapshot` rules as the API (id, tag ref, or latest
committed_at ≤ timestamp).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
_META = "snapshots|files|history|manifests|partitions|refs|changes|incremental"
#: table references are recognized in relation position only (after
#: FROM / JOIN / a FROM-list comma) — a bare ``alias.column`` in an
#: expression is never touched, and the existence check against the
#: catalog filters the rest
#: identifiers may be bare or backtick-quoted — the reference's F3
#: case (dashed database names need quoting everywhere)
_QIDENT = rf"(?:{_IDENT}|`[^`]+`)"
_REF_RE = re.compile(
    rf"(?P<kw>\b(?:FROM|JOIN)\s+|,\s*)"
    rf"(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})(?:\.(?P<meta>{_META})\b)?"
    rf"(?:\s+VERSION\s+AS\s+OF\s+(?P<ver>'[^']*'|\d+)"
    rf"|\s+TIMESTAMP\s+AS\s+OF\s+(?P<ts>'[^']*')"
    rf"|\s+BETWEEN\s+(?P<lo>\d+)\s+AND\s+(?P<hi>\d+))?",
    re.IGNORECASE,
)


def _unquote(ident: str) -> str:
    return ident[1:-1] if ident.startswith("`") else ident


def _scan_string(s: str, i: int) -> int:
    """``s[i]`` opens a string literal (``'`` or ``"``); return the
    index of its closing quote (or ``len(s)`` if unterminated).
    Honors BOTH escape forms Spark's default parser accepts
    (``escapedStringLiterals=false``): a doubled quote (``''`` /
    ``""``) and a backslash escape (``\\'`` / ``\\"`` / ``\\\\``)."""
    quote, j, n = s[i], i + 1, len(s)
    while j < n:
        ch = s[j]
        if ch == "\\":
            j += 2
            continue
        if ch == quote:
            if j + 1 < n and s[j + 1] == quote:  # doubled-quote escape
                j += 2
                continue
            return j
        j += 1
    return n


def _mask_literals(query: str) -> str:
    """Return ``query`` with the CONTENTS of string literals
    (``'…'`` and ``"…"`` — Spark's ANSI defaults keep
    ``doubleQuotedIdentifiers=false``, so a double-quoted span is a
    string literal, not an identifier — with ``''``/``""`` and
    backslash escapes), ``--`` line comments and ``/* */`` block
    comments replaced by ``\\x01`` (same length, so every character
    position outside a literal is identical to the original).
    ``_REF_RE`` cannot match inside masked spans — ``\\x01`` is
    neither an identifier character nor a comma — so a literal
    containing ``FROM db.t`` is never rewritten. Callers run the
    regex over the MASKED text and splice replacements into the
    ORIGINAL, restoring literals for free."""
    out = list(query)
    i, n = 0, len(query)
    while i < n:
        ch = query[i]
        if ch in ("'", '"'):
            j = _scan_string(query, i)
            for k in range(i + 1, min(j, n)):
                out[k] = "\x01"
            i = j + 1
        elif ch == "-" and query[i:i + 2] == "--":
            j = query.find("\n", i)
            j = n if j < 0 else j
            for k in range(i, j):
                out[k] = "\x01"
            i = j
        elif ch == "/" and query[i:i + 2] == "/*":
            j = query.find("*/", i + 2)
            j = n if j < 0 else j + 2
            for k in range(i, j):
                out[k] = "\x01"
            i = j
        else:
            i += 1
    return "".join(out)


def snapcat_sql(
    spark: SparkSession,
    catalog,
    query: str,
    pins: dict[str, int] | None = None,
) -> DataFrame:
    """Run ``query`` with every ``db.table`` reference bound to
    ``catalog`` (see module docstring). Supports::

        SELECT * FROM db.t
        SELECT * FROM db.t VERSION AS OF 3          -- snapshot id
        SELECT * FROM db.t VERSION AS OF 'release'  -- tag ref
        SELECT * FROM db.t TIMESTAMP AS OF '2024-06-02T00:00:00+00:00'
        SELECT * FROM db.t.snapshots                -- metadata tables
        SELECT * FROM db.t.changes BETWEEN 2 AND 5  -- row-level CDC
        SELECT * FROM db.t.incremental BETWEEN 2 AND 5  -- appended rows
        ... any join/CTE/subquery combining them ...

    Only identifiers naming an EXISTING catalog table are rewritten;
    everything else (aliases, temp views, column refs) passes through
    to Catalyst untouched.
    """
    tables: dict[str, set[str]] = {}

    def _is_table(db: str, tbl: str) -> bool:
        if db not in tables:
            tables[db] = set(catalog.list_tables(db))
        return tbl in tables[db]

    views: dict[tuple, str] = {}

    def _bind(m: re.Match, query: str) -> str:
        # group text is read from the ORIGINAL query by span (masking
        # preserves length, so positions align): the match itself runs
        # over masked text, where a VERSION/TIMESTAMP AS OF literal's
        # content is \x01s
        def g(name: str) -> str | None:
            return query[m.start(name):m.end(name)] if m.start(name) != -1 else None

        db, tbl = _unquote(g("db")), _unquote(g("tbl"))
        if not _is_table(db, tbl):
            return query[m.start():m.end()]
        meta, ver, ts = g("meta"), g("ver"), g("ts")
        lo, hi = g("lo"), g("hi")
        if lo is not None and (meta or "").lower() not in ("changes", "incremental"):
            # a BETWEEN range only makes sense on the CDC suffixes; a
            # relation can't be followed by BETWEEN in legal SQL, so
            # this is an expression false-positive — leave it alone
            return query[m.start():m.end()]
        # ONE view per (db, table, meta, version): duplicate
        # references — including a fully-qualified ``db.t.col`` in a
        # select list, whose ``db.t`` prefix this regex's comma
        # branch also rewrites — all resolve to the same name, so
        # the qualified column still binds against the FROM clause's
        # view instead of a fresh unresolvable one (ADVICE r8)
        key = (db, tbl, meta, ver, ts, lo, hi)
        if key in views:
            return f"{g('kw')}{views[key]}"
        t = catalog.table(db, tbl)
        if meta and meta.lower() in ("changes", "incremental"):
            # CDC reads (≙ Iceberg create_changelog_view / the
            # incremental-append scan): FROM db.t.changes BETWEEN a
            # AND b — a exclusive, b inclusive; no range = from table
            # creation to the published head
            to_id = int(hi) if hi is not None else t.current_snapshot().snapshot_id
            # 0 = "from table creation" (snapshot ids start at 1; the
            # start bound is exclusive, so 0 and None mean the same)
            from_id = int(lo) if lo is not None and int(lo) != 0 else None
            if meta.lower() == "changes":
                df = t.changelog(spark, from_id, to_id)
            else:
                df = t.read_incremental(spark, from_id, to_id)
        elif meta:
            df = {
                "snapshots": t.snapshots_df,
                "files": t.files_df,
                "history": t.history_df,
                "manifests": t.manifests_df,
                "partitions": t.partitions_df,
                "refs": t.refs_df,
            }[meta.lower()](spark)
        else:
            kw: dict = {}
            if ver is not None:
                if ver.startswith("'"):
                    kw["ref"] = ver[1:-1]  # named tag/branch
                else:
                    kw["snapshot_id"] = int(ver)
            elif ts is not None:
                kw["as_of"] = ts[1:-1]
            elif pins and f"{db}.{tbl}" in pins:
                # snapshot-isolation pin (ConsistentReader): bare
                # references resolve at the pinned snapshot; an
                # explicit VERSION/TIMESTAMP AS OF above overrides
                kw["snapshot_id"] = pins[f"{db}.{tbl}"]
            df = t.read(spark, **kw)
        view = re.sub(
            r"[^A-Za-z0-9_]", "_",
            f"__snapcat_{db}_{tbl}_{meta or 'data'}_{len(views) + 1}",
        )
        views[key] = view
        df.createOrReplaceTempView(view)
        return f"{g('kw')}{view}"

    # rewrite over the MASKED text (literals/comments cannot match),
    # splicing replacements into the ORIGINAL text — unmatched spans
    # come from the original, so masked literals are restored verbatim
    masked = _mask_literals(query)
    parts, pos = [], 0
    for m in _REF_RE.finditer(masked):
        parts.append(query[pos:m.start()])
        parts.append(_bind(m, query))
        pos = m.end()
    parts.append(query[pos:])
    rewritten = "".join(parts)

    # second pass: fully-qualified COLUMN references (``db.t.col``)
    # outside relation position — e.g. the first item of a select
    # list — rewrite their ``db.t`` prefix to the view the relation
    # pass bound, so they resolve exactly like ``alias.col`` would.
    # Only when the table was bound UNVERSIONED exactly once (two
    # versions of the same table in one query make a bare qualified
    # column genuinely ambiguous — leave it for Catalyst to reject).
    data_views: dict[tuple[str, str], list[str]] = {}
    for (db, tbl, meta, ver, ts, lo, hi), v in views.items():
        if meta is None and ver is None and ts is None:
            data_views.setdefault((db, tbl), []).append(v)
    unique = {k: vs[0] for k, vs in data_views.items() if len(vs) == 1}
    if unique:
        col_re = re.compile(
            rf"(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})(?=\.(?:{_IDENT}|`))"
        )
        masked2 = _mask_literals(rewritten)
        out, pos = [], 0
        for m in col_re.finditer(masked2):
            key = (
                _unquote(rewritten[m.start("db"):m.end("db")]),
                _unquote(rewritten[m.start("tbl"):m.end("tbl")]),
            )
            if key in unique:
                out.append(rewritten[pos:m.start()])
                out.append(unique[key])
                pos = m.end()
        out.append(rewritten[pos:])
        rewritten = "".join(out)
    return spark.sql(rewritten)


# ---------------------------------------------------------------------------
# DML: the write half of the SQL surface, mapped onto the engine verbs
# ---------------------------------------------------------------------------

_DML_INSERT = re.compile(
    rf"^\s*INSERT\s+(?P<how>INTO|OVERWRITE)\s+(?P<db>{_IDENT})\.(?P<tbl>{_IDENT})"
    rf"\s+(?P<rest>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_DML_CTAS = re.compile(
    rf"^\s*CREATE\s+TABLE\s+(?P<db>{_IDENT})\.(?P<tbl>{_IDENT})\s+AS\s+(?P<rest>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_DML_MERGE_HEAD = re.compile(
    rf"^\s*MERGE\s+INTO\s+(?P<db>{_IDENT})\.(?P<tbl>{_IDENT})"
    rf"(?:\s+(?:AS\s+)?(?P<alias>{_IDENT}))?\s+USING\s+",
    re.IGNORECASE,
)
_DML_DELETE = re.compile(
    rf"^\s*DELETE\s+FROM\s+(?P<db>{_IDENT})\.(?P<tbl>{_IDENT})"
    rf"(?:\s+WHERE\s+(?P<cond>.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_DML_UPDATE = re.compile(
    rf"^\s*UPDATE\s+(?P<db>{_IDENT})\.(?P<tbl>{_IDENT})\s+SET\s+(?P<sets>.+?)"
    rf"(?:\s+WHERE\s+(?P<cond>.+))?$",
    re.IGNORECASE | re.DOTALL,
)


_DML_DROP = re.compile(
    rf"^\s*DROP\s+TABLE\s+(?P<db>{_IDENT})\.(?P<tbl>{_IDENT})\s*$",
    re.IGNORECASE,
)
_DML_RENAME = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<db>{_IDENT})\.(?P<tbl>{_IDENT})\s+RENAME\s+TO\s+"
    rf"(?P<db2>{_IDENT})\.(?P<tbl2>{_IDENT})\s*$",
    re.IGNORECASE,
)


#: one nesting level of parens — partition transforms (`bucket(4, id)`)
#: and parameterized types (`decimal(10,2)`) never nest deeper
_NEST1 = r"[^()]*(?:\([^()]*\)[^()]*)*"
_DML_CREATE = re.compile(
    rf"^\s*CREATE\s+TABLE\s+(?P<db>{_IDENT})\.(?P<tbl>{_IDENT})\s*"
    rf"\((?P<cols>{_NEST1})\)\s*"
    rf"(?:PARTITIONED\s+BY\s*\((?P<spec>{_NEST1})\)\s*)?"
    rf"(?:TBLPROPERTIES\s*\((?P<props>.*)\)\s*)?;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DML_ALTER_ADD = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<db>{_IDENT})\.(?P<tbl>{_IDENT})\s+"
    rf"ADD\s+COLUMNS?\s+(?P<cols>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DML_ALTER_DROP = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<db>{_IDENT})\.(?P<tbl>{_IDENT})\s+"
    rf"DROP\s+COLUMNS?\s*\(?(?P<cols>[^()]+?)\)?\s*;?\s*$",
    re.IGNORECASE,
)
_DML_ALTER_RENAME_COL = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<db>{_IDENT})\.(?P<tbl>{_IDENT})\s+"
    rf"RENAME\s+COLUMN\s+(?P<old>{_IDENT})\s+TO\s+(?P<new>{_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_DML_ALTER_TYPE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<db>{_IDENT})\.(?P<tbl>{_IDENT})\s+"
    rf"ALTER\s+COLUMN\s+(?P<col>{_IDENT})\s+TYPE\s+(?P<type>.+?)\s*;?\s*$",
    re.IGNORECASE,
)
_DML_SET_PROPS = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<db>{_IDENT})\.(?P<tbl>{_IDENT})\s+"
    rf"(?P<unset>UN)?SET\s+TBLPROPERTIES\s*\((?P<pairs>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DML_CALL = re.compile(
    rf"^\s*CALL\s+(?P<path>{_IDENT}(?:\.{_IDENT})*)\s*\((?P<args>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _call_literal(tok: str):
    """One CALL argument literal: 'string' (''-escaped), integer, or
    true/false."""
    if tok.startswith("'") and tok.endswith("'") and len(tok) >= 2:
        return tok[1:-1].replace("''", "'")
    low = tok.lower()
    if low in ("true", "false"):
        return low == "true"
    if re.fullmatch(r"-?\d+", tok):
        return int(tok)
    raise ValueError(f"CALL: cannot parse argument {tok!r}")


def _parse_call_args(text: str) -> tuple[list, dict]:
    """Iceberg-procedure argument list: positional literals and
    ``name => literal`` pairs, comma-split at depth 0."""
    pos: list = []
    named: dict = {}
    if not text.strip():
        return pos, named
    for part in _split_top(text):
        part = part.strip()
        m = re.match(rf"^({_IDENT})\s*=>\s*(.+)$", part, re.DOTALL)
        if m:
            named[m.group(1).lower()] = _call_literal(m.group(2).strip())
        else:
            if named:
                raise ValueError("CALL: positional argument after named argument")
            pos.append(_call_literal(part))
    return pos, named


def _call_table(args: list) -> tuple[str, str, list]:
    if not args or not isinstance(args[0], str) or "." not in args[0]:
        raise ValueError("CALL: first argument must be a 'db.table' string")
    db, _, tbl = args[0].partition(".")
    return db, tbl, args[1:]


_DML_SHOW_TABLES = re.compile(
    rf"^\s*SHOW\s+TABLES\s+IN\s+(?P<db>{_IDENT})\s*$", re.IGNORECASE
)
_DML_SHOW_NS = re.compile(r"^\s*SHOW\s+NAMESPACES\s*$", re.IGNORECASE)
_DML_SHOW_PROPS = re.compile(
    rf"^\s*SHOW\s+TBLPROPERTIES\s+(?P<db>{_IDENT})\.(?P<tbl>{_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_DML_SHOW_CREATE = re.compile(
    rf"^\s*SHOW\s+CREATE\s+TABLE\s+(?P<db>{_IDENT})\.(?P<tbl>{_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_DML_SHOW_PARTS = re.compile(
    rf"^\s*SHOW\s+PARTITIONS\s+(?P<db>{_IDENT})\.(?P<tbl>{_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_DML_DESCRIBE = re.compile(
    rf"^\s*DESCRIBE\s+(?:TABLE\s+)?(?P<db>{_IDENT})\.(?P<tbl>{_IDENT})\s*$",
    re.IGNORECASE,
)


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/quote depth zero (SET lists contain
    function calls with commas and quoted strings with anything).
    String spans use the same escape-aware scanner as the masker, so
    a ``''``/``\\'``-escaped quote inside a literal doesn't end it."""
    parts, depth, start, i, n = [], 0, 0, 0, len(s)
    while i < n:
        ch = s[i]
        if ch in ("'", '"'):
            i = _scan_string(s, i) + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(s[start:i])
            start = i + 1
        i += 1
    parts.append(s[start:])
    return parts


def _find_top_kw(masked: str, start: int, kw: str) -> int:
    """Index of the first occurrence of keyword ``kw`` in ``masked``
    at paren depth 0, case-insensitive, bounded by non-identifier
    chars; -1 if absent. ``masked`` comes from :func:`_mask_literals`,
    so string literals can never match."""
    up, k, depth, n = masked.upper(), kw.upper(), 0, len(masked)
    i = start
    while i < n:
        ch = masked[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and up.startswith(k, i):
            before_ok = i == 0 or not (masked[i - 1].isalnum() or masked[i - 1] == "_")
            j = i + len(k)
            after_ok = j >= n or not (masked[j].isalnum() or masked[j] == "_")
            if before_ok and after_ok:
                return i
        i += 1
    return -1


def _merge_key_cols(cond: str, target_names: set[str]) -> list[str]:
    """Extract the equi-join key columns from a MERGE ON condition:
    a conjunction of ``t.col = s.col`` terms where both sides name the
    SAME column (the upsert-key shape the engine verbs take). Anything
    else is rejected loudly rather than silently mis-merged."""
    keys: list[str] = []
    for term in re.split(r"\bAND\b", cond, flags=re.IGNORECASE):
        m = re.match(
            rf"^\s*(?:{_IDENT}\.)?(?P<l>{_IDENT})\s*=\s*(?:{_IDENT}\.)?(?P<r>{_IDENT})\s*$",
            term,
        )
        if not m or m.group("l") != m.group("r"):
            raise ValueError(
                f"MERGE ON: unsupported term {term.strip()!r} — expected a "
                "conjunction of `target.col = source.col` equalities on "
                "identically-named key columns"
            )
        if m.group("l") not in target_names:
            raise ValueError(
                f"MERGE ON: key column {m.group('l')!r} not in target schema"
            )
        keys.append(m.group("l"))
    return keys


def _dml_report(spark: SparkSession, op: str, db: str, tbl: str, snap) -> DataFrame:
    return spark.createDataFrame(
        [(op, f"{db}.{tbl}", snap.snapshot_id, snap.operation)],
        "statement string, table string, snapshot_id bigint, operation string",
    )


def snapcat_dml(spark: SparkSession, catalog, query: str) -> DataFrame | None:
    """Try ``query`` as a DML statement against the catalog; None if
    it isn't one (callers then run it as a read). Supported — each
    mapping 1:1 onto an engine verb, so all commit semantics
    (snapshots, changelog, locks, WAP) are the engine's::

        INSERT INTO db.t <select>        → write(mode="append")
        INSERT OVERWRITE db.t <select>   → write(mode="overwrite")
        CREATE TABLE db.t AS <select>    → write on a fresh table
        DELETE FROM db.t [WHERE <cond>]  → delete_where (COW)
        UPDATE db.t SET c = e, … [WHERE] → update_where (COW)
        MERGE INTO db.t USING <src> ON <t.k = s.k [AND …]>
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT * → upsert / upsert_mor
          (strategy from the target's ``write.merge.mode`` property;
          insert-only, update-only and WHEN MATCHED THEN DELETE
          variants map to append-after-anti-join / filtered upsert /
          delete_keys)
        CREATE TABLE db.t (<ddl cols>) [PARTITIONED BY (spec,…)]
          [TBLPROPERTIES ('k'='v',…)]  → create_table (G2-correct)
        ALTER TABLE db.t ADD COLUMNS (c type,…) | DROP COLUMN c
          | RENAME COLUMN a TO b | ALTER COLUMN c TYPE t
          → alter_table (metadata-only schema evolution)
        ALTER TABLE db.t [UN]SET TBLPROPERTIES (…) → set_properties
        SHOW TBLPROPERTIES db.t | SHOW CREATE TABLE db.t (round-trip
          DDL) | SHOW PARTITIONS db.t → introspection tables
        CALL [cat.]system.<proc>(…)    → table services (see
          _call_procedure)

    The <select> body may itself use every read feature (time travel,
    metadata tables, catalog joins). Returns a one-row commit report.
    """
    m = _DML_INSERT.match(query) or _DML_CTAS.match(query)
    if m:
        db, tbl = m.group("db"), m.group("tbl")
        is_ctas = m.re is _DML_CTAS
        if is_ctas and catalog.table(db, tbl).exists():
            raise ValueError(f"CREATE TABLE AS: {db}.{tbl} already exists")
        how = "append" if is_ctas else m.group("how").lower()
        df = snapcat_sql(spark, catalog, m.group("rest"))
        t = catalog.table(db, tbl)
        if not is_ctas and not t.exists():
            # ANSI: INSERT never creates — a typo'd name must fail
            # loud, not silently materialize a new table
            raise LookupError(
                f"INSERT {how.upper()}: {db}.{tbl} does not exist "
                "(use CREATE TABLE ... AS to create)"
            )
        if not is_ctas and t.current_snapshot() is not None:
            # ANSI INSERT maps the select list POSITIONALLY onto the
            # target schema (a bare VALUES clause arrives as colN
            # names; a by-name merge would silently append new
            # columns instead — found by a VALUES round-trip test)
            tgt = [f.name for f in t.schema().fields]
            if len(df.columns) != len(tgt):
                raise ValueError(
                    f"INSERT {how.upper()} {db}.{tbl}: select list has "
                    f"{len(df.columns)} column(s), target has {len(tgt)}"
                )
            df = df.toDF(*tgt)
        snap = catalog.write(
            db, tbl, df, mode="overwrite" if how == "overwrite" else "append"
        )
        stmt = "CREATE TABLE AS" if is_ctas else f"INSERT {how.upper()}"
        return _dml_report(spark, stmt, db, tbl, snap)
    masked_q = _mask_literals(query)
    m = _DML_MERGE_HEAD.match(masked_q)
    if m:
        # MERGE INTO db.t [AS a] USING <relation|(subquery)> [AS s]
        #   ON t.k = s.k [AND ...]
        #   WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
        #   | WHEN NOT MATCHED THEN INSERT *     (insert-only)
        #   | WHEN MATCHED THEN UPDATE SET *     (update-only)
        #   | WHEN MATCHED THEN DELETE           (delete-matched)
        # Row-level strategy follows the target's `write.merge.mode`
        # table property (Iceberg's own switch): copy-on-write →
        # file-level COW upsert; merge-on-read → one append+equality-
        # delete commit. Free-text sections are located over the
        # MASKED text at paren depth 0, spans read from the original.
        db, tbl = m.group("db"), m.group("tbl")
        on_at = _find_top_kw(masked_q, m.end(), "ON")
        if on_at < 0:
            raise ValueError("MERGE: missing ON clause")
        when_at = _find_top_kw(masked_q, on_at, "WHEN")
        if when_at < 0:
            raise ValueError("MERGE: missing WHEN clause(s)")
        src_text = query[m.end():on_at].strip()
        cond = query[on_at + 2:when_at].strip()
        clauses = re.sub(r"\s+", " ", query[when_at:]).strip().upper().rstrip(";").rstrip()

        t = catalog.table(db, tbl)
        if not t.exists():
            raise LookupError(f"MERGE INTO: {db}.{tbl} does not exist")
        tgt = [f.name for f in t.schema().fields]
        keys = _merge_key_cols(cond, set(tgt))
        src_df = snapcat_sql(spark, catalog, f"SELECT * FROM {src_text}")
        mode = t.properties().get("write.merge.mode", "copy-on-write")

        if clauses == "WHEN MATCHED THEN DELETE":
            snap = catalog.delete_keys(
                db, tbl, src_df.select(*keys).distinct(), key_cols=keys
            )
            return _dml_report(spark, "MERGE DELETE", db, tbl, snap)

        missing = [c for c in tgt if c not in src_df.columns]
        if missing:
            raise ValueError(
                f"MERGE INTO {db}.{tbl}: source is missing target "
                f"column(s) {missing} (UPDATE SET * / INSERT * need the "
                "full target schema)"
            )
        updates = src_df.select(*tgt)
        full = "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        if clauses == full:
            pass  # the verbs' native semantics
        elif clauses == "WHEN NOT MATCHED THEN INSERT *":
            existing = t.read(spark).select(*keys).distinct()
            new_rows = updates.join(existing, keys, "left_anti")
            snap = catalog.write(db, tbl, new_rows, mode="append")
            return _dml_report(spark, "MERGE INSERT", db, tbl, snap)
        elif clauses == "WHEN MATCHED THEN UPDATE SET *":
            existing = t.read(spark).select(*keys).distinct()
            updates = updates.join(existing, keys, "left_semi")
        else:
            raise ValueError(
                f"MERGE: unsupported WHEN clause shape {clauses!r} — "
                f"supported: {full!r}, 'WHEN NOT MATCHED THEN INSERT *', "
                "'WHEN MATCHED THEN UPDATE SET *', 'WHEN MATCHED THEN DELETE'"
            )
        if mode == "merge-on-read":
            snap = catalog.upsert_mor(db, tbl, updates, key_cols=keys)
        else:
            snap = catalog.upsert(db, tbl, updates, key_cols=keys)
        return _dml_report(spark, "MERGE", db, tbl, snap)
    # UPDATE is the one statement with free text BEFORE its WHERE: the
    # lazy SET-list group would otherwise stop at a ``' WHERE '`` inside
    # a string literal. Match over the MASKED text (same length) and
    # read every group's span from the original, like snapcat_sql does.
    m = _DML_UPDATE.match(_mask_literals(query))
    if m:
        def orig(name: str) -> str | None:
            return query[m.start(name):m.end(name)] if m.start(name) != -1 else None

        sets = {}
        for part in _split_top(orig("sets")):
            col, _, expr = part.partition("=")
            if not _:
                raise ValueError(f"UPDATE SET: cannot parse {part!r}")
            sets[col.strip()] = expr.strip()
        snap = catalog.update_where(
            orig("db"), orig("tbl"), orig("cond") or "true", sets
        )
        return _dml_report(spark, "UPDATE", orig("db"), orig("tbl"), snap)
    m = _DML_DELETE.match(query)
    if m:
        snap = catalog.delete_where(
            m.group("db"), m.group("tbl"), m.group("cond") or "true"
        )
        return _dml_report(spark, "DELETE", m.group("db"), m.group("tbl"), snap)
    m = _DML_DROP.match(query)
    if m:
        if not catalog.table(m.group("db"), m.group("tbl")).exists():
            raise LookupError(
                f"DROP TABLE: {m.group('db')}.{m.group('tbl')} does not exist"
            )
        catalog.drop_table(m.group("db"), m.group("tbl"))
        return spark.createDataFrame(
            [("DROP TABLE", f"{m.group('db')}.{m.group('tbl')}")],
            "statement string, table string",
        )
    m = _DML_SHOW_TABLES.match(query)
    if m:
        return spark.createDataFrame(
            [(m.group("db"), t) for t in catalog.list_tables(m.group("db"))]
            or spark.sparkContext.emptyRDD(),
            "namespace string, tableName string",
        )
    if _DML_SHOW_NS.match(query):
        return spark.createDataFrame(
            [(ns,) for ns in catalog.list_namespaces() if not ns.startswith("_")],
            "namespace string",
        )
    m = _DML_DESCRIBE.match(query)
    if m:
        t = catalog.table(m.group("db"), m.group("tbl"))
        if not t.exists():
            raise LookupError(
                f"DESCRIBE: {m.group('db')}.{m.group('tbl')} does not exist"
            )
        spec = t.partition_spec()
        return spark.createDataFrame(
            [
                (f.name, f.dataType.simpleString(), f.name in spec)
                for f in t.schema().fields
            ],
            "col_name string, data_type string, is_partition boolean",
        )
    m = _DML_RENAME.match(query)
    if m:
        catalog.rename_table(
            m.group("db"), m.group("tbl"), m.group("db2"), m.group("tbl2")
        )
        return spark.createDataFrame(
            [("RENAME TABLE",
              f"{m.group('db')}.{m.group('tbl')} -> "
              f"{m.group('db2')}.{m.group('tbl2')}")],
            "statement string, table string",
        )
    m = _DML_SHOW_PROPS.match(query)
    if m:
        props = catalog.table(m.group("db"), m.group("tbl")).properties()
        return spark.createDataFrame(
            sorted(props.items()), "key string, value string"
        )
    m = _DML_SHOW_CREATE.match(query)
    if m:
        # reconstructed DDL — the round-trip text a user would run to
        # recreate the table on another catalog (schema from the
        # current snapshot's G1-correct DDL, spec and properties from
        # first-class metadata)
        t = catalog.table(m.group("db"), m.group("tbl"))
        if not t.exists():
            raise LookupError(
                f"SHOW CREATE TABLE: {m.group('db')}.{m.group('tbl')} does not exist"
            )
        snap = t.current_snapshot() or t.snapshots()[-1]
        stmt = f"CREATE TABLE {m.group('db')}.{m.group('tbl')} ({snap.schema_ddl})"
        if snap.partition_spec:
            stmt += f" PARTITIONED BY ({', '.join(snap.partition_spec)})"
        props = t.properties()
        if props:
            pairs = ", ".join(
                "'{}' = '{}'".format(k.replace("'", "''"), v.replace("'", "''"))
                for k, v in sorted(props.items())
            )
            stmt += f" TBLPROPERTIES ({pairs})"
        return spark.createDataFrame([(stmt,)], "createtab_stmt string")
    m = _DML_SHOW_PARTS.match(query)
    if m:
        return catalog.table(m.group("db"), m.group("tbl")).partitions_df(spark)
    m = _DML_CREATE.match(query)
    if m:
        # CREATE TABLE db.t (<DDL cols>) [PARTITIONED BY (spec,…)]
        #   [TBLPROPERTIES ('k'='v',…)] — W2 as SQL (partition spec
        # survives creation, fixing reference gap G2 on this surface
        # too); the column list is Spark DDL text, handed to the
        # engine's schema parser verbatim
        db, tbl = m.group("db"), m.group("tbl")
        if catalog.table(db, tbl).exists():
            raise ValueError(f"CREATE TABLE: {db}.{tbl} already exists")
        spec = (
            [s.strip() for s in _split_top(m.group("spec")) if s.strip()]
            if m.group("spec") is not None
            else None
        )
        props = _prop_pairs(m.group("props")) if m.group("props") else None
        catalog.create_table(
            db, tbl, m.group("cols").strip(), partition_by=spec, properties=props
        )
        return spark.createDataFrame(
            [("CREATE TABLE", f"{db}.{tbl}",
              ",".join(spec or []), len(props or {}))],
            "statement string, table string, partition_spec string, n_properties int",
        )
    m = _DML_ALTER_RENAME_COL.match(query)
    if m:
        snap = catalog.alter_table(
            m.group("db"), m.group("tbl"),
            rename_columns={m.group("old"): m.group("new")},
        )
        return _dml_report(
            spark, "ALTER TABLE RENAME COLUMN", m.group("db"), m.group("tbl"), snap
        )
    m = _DML_ALTER_TYPE.match(query)
    if m:
        snap = catalog.alter_table(
            m.group("db"), m.group("tbl"),
            widen_columns={m.group("col"): m.group("type").strip()},
        )
        return _dml_report(
            spark, "ALTER TABLE ALTER COLUMN TYPE", m.group("db"), m.group("tbl"), snap
        )
    m = _DML_ALTER_ADD.match(query)
    if m:
        cols_text = m.group("cols").strip()
        if cols_text.startswith("(") and cols_text.endswith(")"):
            cols_text = cols_text[1:-1]
        adds: dict[str, str] = {}
        for item in _split_top(cols_text):
            name, _, dtype = item.strip().partition(" ")
            if not dtype.strip():
                raise ValueError(f"ADD COLUMNS: cannot parse {item.strip()!r}")
            adds[name.strip()] = dtype.strip()
        snap = catalog.alter_table(m.group("db"), m.group("tbl"), add_columns=adds)
        return _dml_report(
            spark, "ALTER TABLE ADD COLUMNS", m.group("db"), m.group("tbl"), snap
        )
    m = _DML_ALTER_DROP.match(query)
    if m:
        drops = [c.strip() for c in _split_top(m.group("cols")) if c.strip()]
        snap = catalog.alter_table(m.group("db"), m.group("tbl"), drop_columns=drops)
        return _dml_report(
            spark, "ALTER TABLE DROP COLUMNS", m.group("db"), m.group("tbl"), snap
        )
    m = _DML_SET_PROPS.match(query)
    if m:
        if m.group("unset"):
            keys = [
                _call_literal(k.strip()) for k in _split_top(m.group("pairs"))
            ]
            updates: dict = {str(k): None for k in keys}
        else:
            updates = dict(_prop_pairs(m.group("pairs")))
        props = catalog.set_properties(m.group("db"), m.group("tbl"), updates)
        stmt = "ALTER TABLE UNSET TBLPROPERTIES" if m.group("unset") \
            else "ALTER TABLE SET TBLPROPERTIES"
        return spark.createDataFrame(
            [(stmt, f"{m.group('db')}.{m.group('tbl')}", len(props))],
            "statement string, table string, n_properties int",
        )
    m = _DML_CALL.match(_mask_literals(query))
    if m:
        return _call_procedure(spark, catalog, query, m)
    return None


def _prop_pairs(text: str) -> dict[str, str]:
    """TBLPROPERTIES pair list: ``'k' = 'v', …`` (quoted literals,
    ``''`` escapes)."""
    out: dict[str, str] = {}
    for item in _split_top(text):
        item = item.strip()
        if not item:
            continue
        pm = re.match(r"^('(?:[^']|'')*')\s*=\s*('(?:[^']|'')*')$", item)
        if not pm:
            raise ValueError(f"TBLPROPERTIES: cannot parse {item!r}")
        out[str(_call_literal(pm.group(1)))] = str(_call_literal(pm.group(2)))
    return out


def _call_procedure(spark: SparkSession, catalog, query: str, m: re.Match) -> DataFrame:
    """Iceberg-style maintenance procedures (``CALL [cat.]system.proc(
    'db.t', name => value, …)``) mapped 1:1 onto the engine's table
    services — the ops surface an Iceberg user drives through
    ``CALL catalog.system.*`` (expire_snapshots, remove_orphan_files,
    rollback_to_snapshot, cherrypick_snapshot, fast_forward,
    rewrite_data_files, create_tag, analyze_table, auto_maintain).
    Each returns the procedure's natural result table. The regex ran
    over MASKED text; argument literals are read from the original by
    span."""
    proc = m.group("path").split(".")[-1].lower()
    pos, named = _parse_call_args(query[m.start("args"):m.end("args")])

    if proc == "expire_snapshots":
        db, tbl, rest = _call_table(pos)
        expired = catalog.expire_snapshots(
            db, tbl,
            keep_last=int(named.get("keep_last", rest[0] if rest else 1)),
            older_than=named.get("older_than"),
        )
        return spark.createDataFrame(
            [(int(i),) for i in expired], "expired_snapshot_id bigint"
        )
    if proc == "remove_orphan_files":
        db, tbl, _rest = _call_table(pos)
        removed = catalog.remove_orphan_files(
            db, tbl, dry_run=bool(named.get("dry_run", False))
        )
        return spark.createDataFrame(
            [(p,) for p in removed], "orphan_file_location string"
        )
    if proc == "rollback_to_snapshot":
        db, tbl, rest = _call_table(pos)
        sid = named.get("snapshot_id", rest[0] if rest else None)
        if sid is None:
            raise ValueError("rollback_to_snapshot: snapshot_id required")
        snap = catalog.rollback(db, tbl, int(sid))
        return _dml_report(spark, "CALL rollback_to_snapshot", db, tbl, snap)
    if proc in ("cherrypick_snapshot", "publish"):
        db, tbl, rest = _call_table(pos)
        sid = named.get("snapshot_id", rest[0] if rest else None)
        if sid is None:
            raise ValueError(f"{proc}: snapshot_id required")
        snap = catalog.publish(db, tbl, int(sid))
        return _dml_report(spark, "CALL cherrypick_snapshot", db, tbl, snap)
    if proc == "fast_forward":
        db, tbl, rest = _call_table(pos)
        branch = named.get("branch", rest[0] if rest else None)
        if branch is None:
            raise ValueError("fast_forward: branch required")
        sid = catalog.fast_forward(db, tbl, str(branch))
        return spark.createDataFrame(
            [(f"{db}.{tbl}", str(branch), int(sid))],
            "table string, branch string, snapshot_id bigint",
        )
    if proc in ("rewrite_data_files", "compact"):
        db, tbl, _rest = _call_table(pos)
        cols = {
            k: [c.strip() for c in str(v).split(",") if c.strip()]
            for k, v in named.items()
            if k in ("sort_by", "zorder_by")
        }
        snap = catalog.compact(
            db, tbl, spark,
            target_partitions=named.get("target_partitions"),
            min_file_bytes=named.get("min_file_bytes"),
            **cols,
        )
        return _dml_report(spark, "CALL rewrite_data_files", db, tbl, snap)
    if proc in ("create_tag", "tag"):
        db, tbl, rest = _call_table(pos)
        tag_name = named.get("tag", rest[0] if rest else None)
        if tag_name is None:
            raise ValueError("create_tag: tag name required")
        sid = catalog.tag(db, tbl, str(tag_name), snapshot_id=named.get("snapshot_id"))
        return spark.createDataFrame(
            [(f"{db}.{tbl}", str(tag_name), int(sid))],
            "table string, tag string, snapshot_id bigint",
        )
    if proc in ("analyze_table", "analyze"):
        db, tbl, _rest = _call_table(pos)
        cols = named.get("columns")
        catalog.analyze(
            db, tbl, spark,
            columns=[c.strip() for c in cols.split(",")] if cols else None,
        )
        return catalog.table(db, tbl).stats_df(spark)
    if proc == "auto_maintain":
        from apache_iceberg_tables_migration_tool_spark.sources.snapcat import (
            auto_maintain,
        )

        dbs = named.get("databases") or (pos[0] if pos else None)
        report = auto_maintain(
            catalog, spark,
            databases=[d.strip() for d in dbs.split(",")] if dbs else None,
        )
        return spark.createDataFrame(
            [(r["database"], r["table"], r["action"], r["detail"]) for r in report],
            "database string, table string, action string, detail string",
        )
    raise ValueError(f"CALL: unknown procedure {proc!r}")


def snapcat_execute(spark: SparkSession, catalog, query: str) -> DataFrame:
    """One entry point for both halves: DML statements commit through
    the engine verbs, everything else runs as a catalog-bound read
    (`snapcat_sql`). Trailing semicolons are tolerated (shell users
    type them reflexively; the DML regexes anchor on end-of-string)."""
    query = query.strip().rstrip(";").strip()
    out = snapcat_dml(spark, catalog, query)
    return out if out is not None else snapcat_sql(spark, catalog, query)
