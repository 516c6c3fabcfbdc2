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

import itertools
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
_META = (
    "snapshots|files|history|manifests|partitions|refs|changes|incremental"
    # Iceberg's identifier-based ref reads: db.t.branch_dev / db.t.tag_v1
    rf"|branch_{_IDENT}|tag_{_IDENT}"
)
#: table references are recognized in relation position only (after
#: FROM / JOIN / a FROM-list comma) — a bare ``alias.column`` in an
#: expression is never touched, and the existence check against the
#: catalog filters the rest
#: identifiers may be bare or backtick-quoted — the reference's F3
#: case (dashed database names need quoting everywhere); ``` `` ```
#: inside a quoted identifier is a literal backtick (matters for the
#: DML regexes, which run over ORIGINAL text — the read path sees
#: masked identifier contents where doubling can't appear)
_QIDENT = rf"(?:{_IDENT}|`(?:[^`]|``)+`)"
_REF_RE = re.compile(
    # VERSION AS OF / TIMESTAMP AS OF plus Spark's ANSI synonyms
    # FOR SYSTEM_VERSION AS OF / FOR SYSTEM_TIME AS OF
    rf"(?P<kw>\b(?:FROM|JOIN)\s+|,\s*)"
    rf"(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})(?:\.(?P<meta>{_META})\b)?"
    rf"(?:\s+(?:FOR\s+SYSTEM_)?VERSION\s+AS\s+OF\s+(?P<ver>'[^']*'|\d+)"
    rf"|\s+(?:FOR\s+SYSTEM_TIME\s+AS\s+OF|TIMESTAMP\s+AS\s+OF)\s+(?P<ts>'[^']*')"
    rf"|\s+BETWEEN\s+(?P<lo>\d+)\s+AND\s+(?P<hi>\d+))?",
    re.IGNORECASE,
)


#: process-global sequence for temp-view names. Binding recurses into
#: view bodies (`_bind_catalog_refs` calls itself with a FRESH `views`
#: dict per level), so a per-call counter can hand the same name to an
#: inner (view-body) binding and the outer one — createOrReplaceTempView
#: then silently replaces the outer read with the inner one (ADVICE
#: r13: a view pinned at VERSION 1 clobbered the current read of the
#: same table). A global counter makes every registration unique
#: across recursion levels and statements.
_VIEW_SEQ = itertools.count(1)


def _unquote(ident: str) -> str:
    if ident.startswith("`"):
        return ident[1:-1].replace("``", "`")  # `` = literal backtick
    return ident


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
    r"""Return ``query`` with the CONTENTS of string literals
    (``'…'`` and ``"…"`` — Spark's ANSI defaults keep
    ``doubleQuotedIdentifiers=false``, so a double-quoted span is a
    string literal, not an identifier — with ``''``/``""`` and
    backslash escapes), ``--`` line comments and ``/* */`` block
    comments replaced by ``\x01`` (same length, so every character
    position outside a literal is identical to the original).
    ``_REF_RE`` cannot match inside masked spans — ``\x01`` is
    neither an identifier character nor a comma — so a literal
    containing ``FROM db.t`` is never rewritten. Backtick-quoted
    identifier spans are consumed atomically (contents masked too):
    a quote character INSIDE a backticked identifier is part of the
    name, not a literal opener — without this, ``FROM db.\`t"x\```
    would mis-mask everything after the ``"``. Callers run the regex
    over the MASKED text and splice replacements into the ORIGINAL,
    restoring literals and identifier text for free (group text is
    read from the original by span)."""
    out = list(query)
    i, n = 0, len(query)
    while i < n:
        ch = query[i]
        if ch == "`":
            # backtick identifier: scan to the closing backtick
            # (doubled `` = literal backtick), mask the contents
            j = i + 1
            while j < n:
                if query[j] == "`":
                    if j + 1 < n and query[j + 1] == "`":
                        j += 2
                        continue
                    break
                j += 1
            for k in range(i + 1, min(j, n)):
                out[k] = "\x01"
            i = j + 1
        elif ch in ("'", '"'):
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
    ``catalog`` — see :func:`_bind_catalog_refs` for the supported
    reference forms."""
    return spark.sql(_bind_catalog_refs(spark, catalog, query, pins))


def _bind_catalog_refs(
    spark: SparkSession,
    catalog,
    query: str,
    pins: dict[str, int] | None = None,
    _view_stack: tuple = (),
) -> str:
    """Rewrite ``query`` so every ``db.table`` reference naming an
    EXISTING catalog table — or catalog VIEW (≙ the Iceberg view
    spec: stored query text, re-planned against current table state
    at every read; resolved recursively, cycles rejected) — is bound
    to a temp view of its data (see module docstring) and return the
    rewritten text — the read path runs it whole; DML paths use it to
    bind the catalog references inside a subquery-bearing WHERE
    condition. Supports::

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
        meta, ver, ts = g("meta"), g("ver"), g("ts")
        lo, hi = g("lo"), g("hi")
        if not _is_table(db, tbl):
            vtext = catalog.view_text(db, tbl) if hasattr(catalog, "view_text") else None
            if vtext is None:
                return query[m.start():m.end()]
            # a catalog VIEW: recursively bind its stored text and
            # register the planned result under a temp-view name
            if lo is not None and (meta or "").lower() not in (
                "changes", "incremental"
            ):
                # expression false-positive (`x BETWEEN a AND b`), same
                # rule as the table path below — leave it alone
                return query[m.start():m.end()]
            if ver is not None or ts is not None or meta:
                raise ValueError(
                    f"{db}.{tbl} is a VIEW — time travel, metadata "
                    "tables and CDC suffixes apply to tables only"
                )
            key = (db, tbl, "__view__", None, None, None, None)
            if key in views:
                return f"{g('kw')}{views[key]}"
            if (db, tbl) in _view_stack:
                chain = " -> ".join(f"{d}.{t}" for d, t in _view_stack)
                raise ValueError(
                    f"view cycle: {chain} -> {db}.{tbl}"
                )
            inner = _bind_catalog_refs(
                spark, catalog, vtext, pins, _view_stack + ((db, tbl),)
            )
            vdf = spark.sql(inner)
            vname = re.sub(
                r"[^A-Za-z0-9_]", "_",
                f"__snapcat_view_{db}_{tbl}_{next(_VIEW_SEQ)}",
            )
            views[key] = vname
            vdf.createOrReplaceTempView(vname)
            return f"{g('kw')}{vname}"
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
            if hi is not None:
                to_id = int(hi)
            else:
                head = t.current_snapshot()
                if head is None:  # only staged/WAP commits, no published head
                    raise LookupError(
                        f"{db}.{tbl} has no published snapshot — give "
                        f"{meta} an explicit BETWEEN range"
                    )
                to_id = head.snapshot_id
            # 0 = "from table creation" (snapshot ids start at 1; the
            # start bound is exclusive, so 0 and None mean the same)
            from_id = int(lo) if lo is not None and int(lo) != 0 else None
            if meta.lower() == "changes":
                df = t.changelog(spark, from_id, to_id)
            else:
                df = t.read_incremental(spark, from_id, to_id)
        elif meta and meta.lower().startswith(("branch_", "tag_")):
            # Iceberg's identifier-based ref read: FROM db.t.branch_dev
            # / db.t.tag_v1 — resolve the named ref (case preserved).
            # In COMMA position this shape is ambiguous with a
            # fully-qualified COLUMN named branch_*/tag_* (`SELECT id,
            # db.t.branch_id FROM db.t` — ADVICE r13): when the named
            # ref does not exist, leave the text alone so the
            # second-pass column rewrite binds `db.t` to the FROM
            # clause's view and `.branch_id` resolves as a column. A
            # FROM/JOIN-position miss still raises loudly below.
            ref_name = meta.split("_", 1)[1]
            if g("kw").startswith(",") and ref_name not in t.refs():
                return query[m.start():m.end()]
            df = t.read(spark, ref=ref_name)
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
            f"__snapcat_{db}_{tbl}_{meta or 'data'}_{next(_VIEW_SEQ)}",
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
    return rewritten


# ---------------------------------------------------------------------------
# DML: the write half of the SQL surface, mapped onto the engine verbs
# ---------------------------------------------------------------------------

# every statement regex takes db/table (and column) identifiers as
# _QIDENT — bare or backtick-quoted, same as the read path, closing
# the reference's F3 case (dashed database names) on the WRITE half:
# `INSERT INTO \`my-db\`.t` must commit, not fall through to the read
# path and die with an unrelated Catalyst error. Use-sites unquote.
_DML_INSERT = re.compile(
    rf"^\s*INSERT\s+(?P<how>INTO|OVERWRITE)\s+(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})"
    rf"(?:\.(?P<branch>branch_{_IDENT}))?"  # Iceberg branch write
    rf"\s+(?P<rest>.+)$",
    re.IGNORECASE | re.DOTALL,
)
#: one nesting level of parens — partition transforms (`bucket(4, id)`)
#: and parameterized types (`decimal(10,2)`) never nest deeper
_NEST1 = r"[^()]*(?:\([^()]*\)[^()]*)*"
# the canonical Iceberg CTAS spelling: CREATE TABLE db.t [USING iceberg]
# [PARTITIONED BY (spec,…)] [TBLPROPERTIES ('k'='v',…)] AS <query>
_DML_CTAS = re.compile(
    rf"^\s*CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    rf"(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s+"
    rf"(?:USING\s+(?P<using>{_IDENT})\s+)?"
    rf"(?:PARTITIONED\s+BY\s*\((?P<spec>{_NEST1})\)\s*)?"
    rf"(?:TBLPROPERTIES\s*\((?P<props>[^()]*)\)\s*)?AS\s+(?P<rest>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_DML_MERGE_HEAD = re.compile(
    rf"^\s*MERGE\s+INTO\s+(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})"
    rf"(?:\.(?P<branch>branch_{_IDENT}))?"  # Iceberg branch-targeted MERGE
    rf"(?:\s+(?:AS\s+)?(?P<alias>{_IDENT}))?\s+USING\s+",
    re.IGNORECASE,
)
# DELETE/UPDATE accept Iceberg's identifier-based branch target
# (db.t.branch_dev): the statement scans the BRANCH head and commits
# onto the branch ref only — main is untouched until fast_forward
_DML_DELETE = re.compile(
    rf"^\s*DELETE\s+FROM\s+(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})"
    rf"(?:\.(?P<branch>branch_{_IDENT}))?"
    rf"(?:\s+WHERE\s+(?P<cond>.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_DML_UPDATE = re.compile(
    rf"^\s*UPDATE\s+(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})"
    rf"(?:\.(?P<branch>branch_{_IDENT}))?"
    rf"\s+SET\s+(?P<sets>.+?)"
    rf"(?:\s+WHERE\s+(?P<cond>.+))?$",
    re.IGNORECASE | re.DOTALL,
)


_DML_DROP = re.compile(
    rf"^\s*DROP\s+TABLE\s+(?P<ie>IF\s+EXISTS\s+)?"
    rf"(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s*$",
    re.IGNORECASE,
)
# NAMESPACE/DATABASE/SCHEMA are synonyms, as in Spark SQL; the
# reference's stage 3 issues CREATE NAMESPACE IF NOT EXISTS as SQL
# (3_create_dst_tables.py:73-77)
_DML_CREATE_NS = re.compile(
    rf"^\s*CREATE\s+(?:NAMESPACE|DATABASE|SCHEMA)\s+"
    rf"(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<db>{_QIDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_DML_DROP_NS = re.compile(
    rf"^\s*DROP\s+(?:NAMESPACE|DATABASE|SCHEMA)\s+"
    rf"(?P<ie>IF\s+EXISTS\s+)?(?P<db>{_QIDENT})"
    rf"(?:\s+(?P<mode>CASCADE|RESTRICT))?\s*;?\s*$",
    re.IGNORECASE,
)
# SQL views (≙ the Iceberg view spec): stored query text, re-planned
# against current table state at every read
_DML_CREATE_VIEW = re.compile(
    rf"^\s*CREATE\s+(?P<replace>OR\s+REPLACE\s+)?VIEW\s+"
    rf"(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s*"
    rf"(?:\((?P<cols>[^()]*)\)\s*)?AS\s+(?P<rest>.+)$",
    re.IGNORECASE | re.DOTALL,
)
# ALTER VIEW db.v AS <query>: re-validate + atomic text swap on an
# EXISTING view (≙ Iceberg view-spec replace; CREATE OR REPLACE VIEW
# is the create-or-swap twin)
_DML_ALTER_VIEW = re.compile(
    rf"^\s*ALTER\s+VIEW\s+(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s+AS\s+"
    rf"(?P<rest>.+)$",
    re.IGNORECASE | re.DOTALL,
)
# CREATE TABLE … LIKE: metadata-only clone of schema + partition spec
# + properties — the natural SQL spelling of the reference's stage-3
# schema clone (3_create_dst_tables.py:79-92)
_DML_CREATE_LIKE = re.compile(
    rf"^\s*CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    rf"(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s+"
    rf"LIKE\s+(?P<db2>{_QIDENT})\.(?P<tbl2>{_QIDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_DML_DROP_VIEW = re.compile(
    rf"^\s*DROP\s+VIEW\s+(?P<ie>IF\s+EXISTS\s+)?"
    rf"(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_DML_SHOW_VIEWS = re.compile(
    rf"^\s*SHOW\s+VIEWS\s+IN\s+(?P<db>{_QIDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_DML_TRUNCATE = re.compile(
    rf"^\s*TRUNCATE\s+TABLE\s+(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_DML_RENAME = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s+RENAME\s+TO\s+"
    rf"(?P<db2>{_QIDENT})\.(?P<tbl2>{_QIDENT})\s*$",
    re.IGNORECASE,
)


_DML_CREATE = re.compile(
    rf"^\s*CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    rf"(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s*"
    rf"\((?P<cols>{_NEST1})\)\s*"
    rf"(?:USING\s+(?P<using>{_IDENT})\s*)?"
    rf"(?:PARTITIONED\s+BY\s*\((?P<spec>{_NEST1})\)\s*)?"
    rf"(?:TBLPROPERTIES\s*\((?P<props>.*)\)\s*)?;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DML_ALTER_ADD = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s+"
    rf"ADD\s+COLUMNS?\s+(?P<cols>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# Iceberg partition evolution as SQL: ALTER TABLE t ADD/DROP PARTITION
# FIELD <identity col | transform(col)>, REPLACE … WITH …
_DML_ALTER_PART = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s+"
    rf"(?P<op>ADD|DROP)\s+PARTITION\s+FIELD\s+(?P<field>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DML_ALTER_PART_REPL = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s+"
    rf"REPLACE\s+PARTITION\s+FIELD\s+(?P<old>.+?)\s+WITH\s+(?P<new>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# Iceberg's branch/tag DDL SQL extension: ALTER TABLE … CREATE
# [OR REPLACE] BRANCH|TAG [IF NOT EXISTS] name [AS OF VERSION id],
# REPLACE BRANCH|TAG name AS OF VERSION id, DROP BRANCH|TAG
# [IF EXISTS] name — the DDL half of the refs the read path already
# speaks (FROM db.t.branch_dev / VERSION AS OF 'tag'). RETAIN /
# retention clauses are not modeled (snapshots expire via
# expire_snapshots, which keeps ref'd snapshots).
_DML_ALTER_REF = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s+"
    rf"(?P<op>CREATE(?:\s+OR\s+REPLACE)?|REPLACE|DROP)\s+"
    rf"(?P<kind>BRANCH|TAG)\s+"
    rf"(?:(?P<ine>IF\s+NOT\s+EXISTS)\s+|(?P<ie>IF\s+EXISTS)\s+)?"
    rf"(?P<ref>{_QIDENT})"
    rf"(?:\s+AS\s+OF\s+VERSION\s+(?P<ver>\d+))?\s*;?\s*$",
    re.IGNORECASE,
)
_DML_ALTER_DROP = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s+"
    rf"DROP\s+COLUMNS?\s*\(?(?P<cols>[^()]+?)\)?\s*;?\s*$",
    re.IGNORECASE,
)
_DML_ALTER_RENAME_COL = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s+"
    rf"RENAME\s+COLUMN\s+(?P<old>{_QIDENT})\s+TO\s+(?P<new>{_QIDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_DML_ALTER_TYPE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s+"
    rf"ALTER\s+COLUMN\s+(?P<col>{_QIDENT})\s+TYPE\s+(?P<type>.+?)\s*;?\s*$",
    re.IGNORECASE,
)
_DML_SET_PROPS = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s+"
    rf"(?P<unset>UN)?SET\s+TBLPROPERTIES\s*\((?P<pairs>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DML_CALL = re.compile(
    rf"^\s*CALL\s+(?P<path>{_IDENT}(?:\.{_IDENT})*)\s*\((?P<args>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _call_literal(tok: str):
    """One CALL argument literal: 'string' (decoding BOTH escape forms
    the masker/splitter accept — doubled-quote ``''`` and backslash),
    integer, float, or true/false."""
    if tok.startswith("'") and tok.endswith("'") and len(tok) >= 2:
        body = tok[1:-1]
        out, i, n = [], 0, len(body)
        while i < n:
            ch = body[i]
            if ch == "\\" and i + 1 < n:
                out.append(body[i + 1])
                i += 2
            elif ch == "'" and i + 1 < n and body[i + 1] == "'":
                out.append("'")
                i += 2
            else:
                out.append(ch)
                i += 1
        return "".join(out)
    low = tok.lower()
    if low in ("true", "false"):
        return low == "true"
    if re.fullmatch(r"-?\d+", tok):
        return int(tok)
    if re.fullmatch(r"-?(?:\d+\.\d*|\.\d+)(?:[eE][-+]?\d+)?|-?\d+[eE][-+]?\d+", tok):
        return float(tok)
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


def _call_table(args: list, named: dict | None = None) -> tuple[str, str, list]:
    """The procedure's target table: the first positional argument or
    — Iceberg's named convention — ``table => 'db.t'``."""
    if args and isinstance(args[0], str) and "." in args[0]:
        db, _, tbl = args[0].partition(".")
        return db, tbl, args[1:]
    t = (named or {}).get("table")
    if isinstance(t, str) and "." in t:
        db, _, tbl = t.partition(".")
        return db, tbl, list(args)
    raise ValueError(
        "CALL: pass the table as the first positional argument or as "
        "table => 'db.table'"
    )


_DML_SHOW_TABLES = re.compile(
    rf"^\s*SHOW\s+TABLES\s+IN\s+(?P<db>{_QIDENT})\s*$", re.IGNORECASE
)
_DML_SHOW_NS = re.compile(r"^\s*SHOW\s+NAMESPACES\s*$", re.IGNORECASE)
_DML_SHOW_PROPS = re.compile(
    rf"^\s*SHOW\s+TBLPROPERTIES\s+(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_DML_SHOW_CREATE = re.compile(
    rf"^\s*SHOW\s+CREATE\s+TABLE\s+(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_DML_SHOW_PARTS = re.compile(
    rf"^\s*SHOW\s+PARTITIONS\s+(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_DML_DESCRIBE = re.compile(
    rf"^\s*DESCRIBE\s+(?:TABLE\s+)?(?P<db>{_QIDENT})\.(?P<tbl>{_QIDENT})\s*$",
    re.IGNORECASE,
)


def _uq(m: re.Match, name: str, text: str | None = None) -> str:
    """Unquoted text of group ``name`` — from ``text`` by span when the
    match ran over masked text (spans align because masking preserves
    length), else from the match itself."""
    s = text[m.start(name):m.end(name)] if text is not None else m.group(name)
    return _unquote(s)


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/quote depth zero (SET lists contain
    function calls with commas and quoted strings with anything).
    String spans use the same escape-aware scanner as the masker, so
    a ``''``/``\\'``-escaped quote inside a literal doesn't end it;
    backtick-quoted identifier spans are skipped atomically, so a
    separator or quote INSIDE a quoted column name doesn't split."""
    parts, depth, start, i, n = [], 0, 0, 0, len(s)
    while i < n:
        ch = s[i]
        if ch in ("'", '"'):
            i = _scan_string(s, i) + 1
            continue
        if ch == "`":
            j = i + 1
            while j < n:
                if s[j] == "`":
                    if j + 1 < n and s[j + 1] == "`":
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
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


def _top_paren_close(s: str, start: int) -> int:
    """Index of the ``)`` closing the ``(`` at ``start``, skipping
    string literals (escape-aware) and backtick-quoted identifier
    spans — so a quoted column name containing ``)`` never ends the
    scan early; -1 if unterminated."""
    depth, i, n = 0, start, len(s)
    while i < n:
        ch = s[i]
        if ch in ("'", '"'):
            i = _scan_string(s, i) + 1
            continue
        if ch == "`":
            j = i + 1
            while j < n:
                if s[j] == "`":
                    if j + 1 < n and s[j + 1] == "`":
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


def _find_top_kw(masked: str, start: int, kw: str) -> int:
    """Index of the first occurrence of keyword ``kw`` in ``masked``
    at paren depth 0, case-insensitive, bounded by non-identifier
    chars; -1 if absent. A ``.`` counts as an identifier boundary
    blocker on BOTH sides: ``db.on`` (a relation or alias literally
    named ``on``) is a qualified name, not the ON keyword. ``masked``
    comes from :func:`_mask_literals`, so string literals can never
    match."""
    up, k, depth, n = masked.upper(), kw.upper(), 0, len(masked)
    i = start
    while i < n:
        ch = masked[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and up.startswith(k, i):
            before_ok = i == 0 or not (
                masked[i - 1].isalnum() or masked[i - 1] in "._"
            )
            j = i + len(k)
            after_ok = j >= n or not (masked[j].isalnum() or masked[j] in "._")
            if before_ok and after_ok:
                return i
        i += 1
    return -1


def _split_relation_alias(src_text: str) -> tuple[str, str | None]:
    """Split a MERGE USING relation into (relation, alias): ``db.s`` →
    (db.s, None), ``db.s AS x`` / ``db.s x`` → (db.s, x),
    ``(subquery) s`` → ((subquery), s)."""
    m = re.match(
        rf"^(?P<rel>.+?)\s+(?:AS\s+)?(?P<alias>{_IDENT})\s*$",
        src_text, re.IGNORECASE | re.DOTALL,
    )
    if m:
        return m.group("rel"), m.group("alias")
    return src_text, None


def _merge_key_pairs(
    cond: str,
    target_names: set[str],
    t_alias: str,
    s_alias: str | None,
    db: str,
    tbl: str,
    s_rel: str | None = None,
) -> list[tuple[str, str]]:
    """Extract the equi-join keys from a MERGE ON condition — a
    conjunction of ``<qual>.col = <qual>.col`` terms — as
    ``(target_col, source_col)`` pairs. A term binds one side to the
    TARGET by qualifier (the target alias, table name, or
    fully-qualified ``db.tbl`` — Spark/Iceberg accept the three-part
    ``db.t.k`` spelling, so ported statements must too); the other
    side is the source (differently-named key columns are fine:
    ``ON t.id = s.customer_id``; the source qualifier may likewise be
    the alias, the relation name, or its full ``db.rel`` form). An
    unqualified ``col = col`` on the same name keeps the legacy shape.
    Anything else is rejected loudly rather than silently mis-merged."""

    def parts(q: str | None) -> tuple[str, ...] | None:
        # a qualifier is 1-2 dot-separated (possibly backticked) idents
        if q is None:
            return None
        return tuple(_unquote(p).lower() for p in re.findall(_QIDENT, q))

    t_quals = {(t_alias.lower(),), (tbl.lower(),), (db.lower(), tbl.lower())}
    s_quals: set[tuple[str, ...]] = set()
    if s_alias is not None:
        s_quals.add((s_alias.lower(),))
    if s_rel is not None:
        s_quals.add(parts(s_rel))
    pairs: list[tuple[str, str]] = []
    for term in re.split(r"\bAND\b", cond, flags=re.IGNORECASE):
        m = re.match(
            rf"^\s*(?:(?P<lq>{_QIDENT}(?:\s*\.\s*{_QIDENT})?)\s*\.\s*)?(?P<l>{_QIDENT})\s*=\s*"
            rf"(?:(?P<rq>{_QIDENT}(?:\s*\.\s*{_QIDENT})?)\s*\.\s*)?(?P<r>{_QIDENT})\s*$",
            term,
        )
        if not m:
            raise ValueError(
                f"MERGE ON: unsupported term {term.strip()!r} — expected a "
                "conjunction of `target.col = source.col` equalities"
            )
        lq, rq = parts(m.group("lq")), parts(m.group("rq"))
        lc, rc = _unquote(m.group("l")), _unquote(m.group("r"))
        l_is_t, r_is_t = lq in t_quals, rq in t_quals
        if l_is_t and r_is_t:
            raise ValueError(
                f"MERGE ON: both sides of {term.strip()!r} qualify as the target"
            )
        if l_is_t or r_is_t:
            tk, sk = (lc, rc) if l_is_t else (rc, lc)
            sq = rq if l_is_t else lq
            # the source side's qualifier, when present, must BE the
            # source (alias or relation name) — a stray qualifier
            # (`ON t.k = bogus.k`) must not silently bind by column name
            if sq is not None and sq not in s_quals:
                raise ValueError(
                    f"MERGE ON: source-side qualifier in {term.strip()!r} is "
                    f"neither the source alias nor the source relation name"
                )
        elif lq is None and rq is None and lc == rc:
            tk = sk = lc  # legacy bare `col = col` shape
        elif lq in s_quals and rq is None:
            tk, sk = rc, lc
        elif rq in s_quals and lq is None:
            tk, sk = lc, rc
        else:
            raise ValueError(
                f"MERGE ON: cannot tell target from source in {term.strip()!r} "
                f"— qualify the target side as {t_alias!r} (or {tbl!r})"
            )
        if tk not in target_names:
            raise ValueError(f"MERGE ON: key column {tk!r} not in target schema")
        pairs.append((tk, sk))
    if len({tk for tk, _ in pairs}) != len(pairs):
        raise ValueError("MERGE ON: duplicate target key column")
    if len({sk for _, sk in pairs}) != len(pairs):
        # one source column bound to several target keys (ON t.a = s.k
        # AND t.b = s.k) — the key-rename machinery (and the
        # cardinality guard) assume a 1:1 key mapping; silently keeping
        # the first binding would merge on a WEAKER condition
        raise ValueError(
            "MERGE ON: source key column bound to multiple target key "
            "columns — project it under distinct names in the source "
            "(e.g. USING (SELECT k AS k1, k AS k2, … FROM src) s)"
        )
    return pairs


def _merge_clauses(
    query: str, masked: str, start: int
) -> list[tuple[str, str | None, str]]:
    """Split the WHEN region into ``(kind, condition, action_text)``
    triples, kind ∈ ``matched`` | ``not_matched`` | ``by_source``
    (``WHEN NOT MATCHED BY SOURCE``, the target-rows-without-a-
    source-match clause), condition = the SQL text of an ``AND …``
    clause condition (None when absent). WHEN positions are found
    over the MASKED text at paren depth 0 (spans align); clause text
    is read from the original. Only a WHEN followed by ``[NOT]
    MATCHED`` is a clause boundary — a ``CASE WHEN`` inside a
    SET/VALUES expression is not. A condition's end is the first
    depth-0 THEN, so an unparenthesized CASE expression inside a
    condition is rejected by construction (parenthesize it)."""
    boundary = re.compile(r"WHEN\s+(?:NOT\s+)?MATCHED\b", re.IGNORECASE)
    idxs, i = [], start
    while True:
        w = _find_top_kw(masked, i, "WHEN")
        if w < 0:
            break
        if boundary.match(masked, w):
            idxs.append(w)
        i = w + 4
    out: list[tuple[str, str | None, str]] = []
    for n, w in enumerate(idxs):
        end = idxs[n + 1] if n + 1 < len(idxs) else len(query)
        text = query[w:end].strip().rstrip(";").strip()
        mtext = masked[w:w + len(text)]
        m = re.match(
            r"^WHEN\s+(?P<not>NOT\s+)?MATCHED\s+(?P<rest>.*)$",
            text, re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"MERGE: cannot parse clause {text!r}")
        rest_at = m.start("rest")
        rest = text[rest_at:].strip()
        kind = "not_matched" if m.group("not") else "matched"
        bs = re.match(r"^BY\s+(?P<side>SOURCE|TARGET)\s+", rest, re.IGNORECASE)
        if bs:
            if kind == "matched":
                raise ValueError(
                    f"MERGE: WHEN MATCHED BY {bs.group('side').upper()} "
                    "is not valid SQL"
                )
            # BY TARGET is the explicit spelling of plain NOT MATCHED
            if bs.group("side").upper() == "SOURCE":
                kind = "by_source"
            rest_at = rest_at + (len(text[rest_at:]) - len(rest)) + bs.end()
            rest = text[rest_at:].strip()
        cond: str | None = None
        if re.match(r"^AND\b", rest, re.IGNORECASE):
            # clause condition: AND <cond> THEN — cond ends at the
            # first depth-0 THEN of the clause's masked text
            and_at = rest_at + (len(text[rest_at:]) - len(rest)) + 3
            then_at = _find_top_kw(mtext, and_at, "THEN")
            if then_at < 0:
                raise ValueError(f"MERGE: missing THEN in clause {text!r}")
            cond = text[and_at:then_at].strip()
            if not cond:
                raise ValueError(f"MERGE: empty clause condition in {text!r}")
            out.append((kind, cond, text[then_at + 4:].strip()))
            continue
        m2 = re.match(r"^THEN\s+(?P<act>.+)$", rest, re.IGNORECASE | re.DOTALL)
        if not m2:
            raise ValueError(f"MERGE: missing THEN in clause {text!r}")
        out.append((kind, None, m2.group("act").strip()))
    if not out:
        raise ValueError("MERGE: missing WHEN clause(s)")
    return out


def _strip_target_qual(col: str, t_alias: str, tbl: str) -> str:
    """``t.v`` / ``tbl.v`` / ``v`` on the left of a SET assignment or
    in an INSERT column list → ``v`` (unquoted)."""
    m = re.fullmatch(rf"(?:(?P<q>{_QIDENT})\.)?(?P<c>{_QIDENT})", col.strip())
    if not m:
        raise ValueError(f"MERGE: cannot parse column {col.strip()!r}")
    if m.group("q") and _unquote(m.group("q")).lower() not in (
        t_alias.lower(), tbl.lower(),
    ):
        raise ValueError(
            f"MERGE: column {col.strip()!r} is qualified with neither the "
            f"target alias {t_alias!r} nor the table name {tbl!r}"
        )
    return _unquote(m.group("c"))


def _parse_merge_action(action: str, t_alias: str, tbl: str):
    """One THEN action → ``(kind, payload)``: ``update_star``,
    ``update_set`` ({target col → SQL expr}), ``delete``,
    ``insert_star``, or ``insert_cols`` ({target col → SQL expr})."""
    if re.fullmatch(r"UPDATE\s+SET\s+\*", action, re.IGNORECASE):
        return "update_star", None
    m = re.match(r"^UPDATE\s+SET\s+(?P<sets>.+)$", action, re.IGNORECASE | re.DOTALL)
    if m:
        sets: dict[str, str] = {}
        for part in _split_top(m.group("sets")):
            col, eq, expr = part.partition("=")
            if not eq or not expr.strip():
                raise ValueError(f"MERGE UPDATE SET: cannot parse {part.strip()!r}")
            sets[_strip_target_qual(col, t_alias, tbl)] = expr.strip()
        return "update_set", sets
    if re.fullmatch(r"DELETE", action, re.IGNORECASE):
        return "delete", None
    if re.fullmatch(r"INSERT\s+\*", action, re.IGNORECASE):
        return "insert_star", None
    m = re.match(
        r"^INSERT\s*\((?P<cols>[^()]*)\)\s*VALUES\s*\((?P<vals>.+)\)$",
        action, re.IGNORECASE | re.DOTALL,
    )
    if m:
        cols = [_strip_target_qual(c, t_alias, tbl) for c in _split_top(m.group("cols"))]
        vals = [v.strip() for v in _split_top(m.group("vals"))]
        if len(cols) != len(vals):
            raise ValueError(
                f"MERGE INSERT: {len(cols)} column(s) but {len(vals)} value(s)"
            )
        return "insert_cols", dict(zip(cols, vals))
    raise ValueError(
        f"MERGE: unsupported action {action!r} — supported: UPDATE SET * | "
        "UPDATE SET col = expr, … | DELETE | INSERT * | "
        "INSERT (col, …) VALUES (expr, …)"
    )


def _merge_execute(
    spark: SparkSession, catalog, query: str, masked_q: str, m: re.Match
) -> DataFrame:
    """MERGE INTO db.t [AS a] USING <relation|(subquery)> [AS s]
      ON <t.k = s.k [AND …]>          (key names may differ per side)
      WHEN MATCHED [AND <cond>] THEN
          UPDATE SET * | UPDATE SET col = expr, … | DELETE
      WHEN NOT MATCHED [AND <cond>] THEN
          INSERT * | INSERT (col, …) VALUES (expr, …)
      WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN
          DELETE | UPDATE SET col = expr, …

    Row-level strategy follows the target's ``write.merge.mode`` table
    property (Iceberg's own switch): copy-on-write → file-level COW
    rewrite of only the matched files; merge-on-read → one
    append+equality-delete commit. Any update/insert/by-source-update
    combination is ONE commit (the parts union into a single upsert);
    insert-only is an anti-join + append; delete-matched and
    standalone BY SOURCE DELETE map to the keyed delete in the mode
    the property selects; unconditional BY SOURCE DELETE combined
    with unconditional update/insert clauses is one overwrite commit
    of the computed final state (the full-sync shape — the right plan
    when most rows change; the keyed-delete form prunes without a
    rewrite). Multiple MATCHED (or NOT MATCHED) clauses with ``AND``
    conditions evaluate in order, first match wins — the CDC-apply
    shape ``WHEN MATCHED AND s.op = 'D' THEN DELETE WHEN MATCHED
    THEN UPDATE SET *`` routes each row to one clause and still lands
    as ONE commit (routed deletes ride the upsert as extra delete
    keys). BY SOURCE composes with the conditional machinery the same
    way (the full CDC-plus-prune statement ``… MATCHED AND op='D'
    DELETE … BY SOURCE DELETE`` is one statement, one commit), as
    does MATCHED DELETE alongside INSERT / BY SOURCE; multiple
    ordered BY SOURCE clauses route first-match-wins like MATCHED
    ones. An unconditional clause must be the last of its kind. With a WHEN
    MATCHED clause, duplicate source keys that match the target raise
    (Iceberg's MERGE_CARDINALITY_VIOLATION); unmatched duplicates
    each insert, as upstream. Free-text sections are located over the
    MASKED text at paren depth 0, spans read from the original."""
    db, tbl = _uq(m, "db", query), _uq(m, "tbl", query)
    # Iceberg branch-targeted MERGE (MERGE INTO db.t.branch_dev …):
    # every target-state read below resolves the BRANCH head, and the
    # commit moves only the branch ref
    branch = (
        query[m.start("branch"):m.end("branch")].split("_", 1)[1]
        if m.start("branch") != -1
        else None
    )
    t_alias = m.group("alias") or tbl
    on_at = _find_top_kw(masked_q, m.end(), "ON")
    if on_at < 0:
        raise ValueError("MERGE: missing ON clause")
    when_at = _find_top_kw(masked_q, on_at, "WHEN")
    if when_at < 0:
        raise ValueError("MERGE: missing WHEN clause(s)")
    src_text = query[m.end():on_at].strip()
    cond = query[on_at + 2:when_at].strip()

    t = catalog.table(db, tbl)
    if not t.exists():
        raise LookupError(f"MERGE INTO: {db}.{tbl} does not exist")

    def tread() -> DataFrame:
        """The target's CURRENT state for this statement: the branch
        head when branch-targeted, else the published head."""
        return t.read(spark, ref=branch) if branch else t.read(spark)

    if branch is not None:
        # schema at the BRANCH head (a branch append may have evolved it)
        from apache_iceberg_tables_migration_tool_spark.sources import snapcat as _sc

        schema = _sc.T._parse_datatype_string(
            t.resolve_snapshot(ref=branch).schema_ddl
        )
    else:
        schema = t.schema()
    tgt = [f.name for f in schema.fields]

    rel_text, s_alias = _split_relation_alias(src_text)
    if s_alias is None:
        rm = re.fullmatch(rf"({_QIDENT})\.({_QIDENT})", rel_text.strip())
        s_alias = _unquote(rm.group(2)) if rm else None
    s_rel = rel_text.strip() if not rel_text.lstrip().startswith("(") else None
    pairs = _merge_key_pairs(cond, set(tgt), t_alias, s_alias, db, tbl, s_rel)
    tgt_keys = [tk for tk, _ in pairs]
    src_keys = [sk for _, sk in pairs]
    src_df = snapcat_sql(spark, catalog, f"SELECT * FROM {src_text}")
    bad = [sk for sk in src_keys if sk not in src_df.columns]
    if bad:
        raise ValueError(f"MERGE ON: source key column(s) {bad} not in source")
    mode = t.properties().get("write.merge.mode", "copy-on-write")

    upds: list = []  # (cond, kind, payload) — ordered, first-match-wins
    inss: list = []
    byss: list = []
    for kind_tag, cond, action in _merge_clauses(query, masked_q, when_at):
        kind, payload = _parse_merge_action(action, t_alias, tbl)
        if kind_tag == "matched":
            if kind not in ("update_star", "update_set", "delete"):
                raise ValueError(f"MERGE: WHEN MATCHED cannot {kind.upper()}")
            upds.append((cond, kind, payload))
        elif kind_tag == "not_matched":
            if kind not in ("insert_star", "insert_cols"):
                raise ValueError(f"MERGE: WHEN NOT MATCHED cannot {kind.upper()}")
            inss.append((cond, kind, payload))
        else:  # by_source: TARGET rows with no source match
            if kind not in ("delete", "update_set"):
                raise ValueError(
                    "MERGE: WHEN NOT MATCHED BY SOURCE can only DELETE or "
                    "UPDATE SET col = expr (there is no source row to read)"
                )
            byss.append((cond, kind, payload))
    # a condition-less clause must be the LAST of its kind — SQL
    # evaluates clauses in order, so anything after it is unreachable
    for label, lst in (
        ("WHEN MATCHED", upds),
        ("WHEN NOT MATCHED", inss),
        ("WHEN NOT MATCHED BY SOURCE", byss),
    ):
        for c, _k, _p in lst[:-1]:
            if c is None:
                raise ValueError(
                    f"MERGE: an unconditional {label} clause makes later "
                    f"{label} clauses unreachable"
                )
    for _c, kind, payload in upds + byss:  # shared UPDATE SET validation
        if kind == "update_set":
            bad_keys = sorted(set(payload) & set(tgt_keys))
            if bad_keys:
                raise ValueError(
                    f"MERGE: UPDATE SET on merge key column(s) {bad_keys}"
                )
            unknown = [c2 for c2 in payload if c2 not in tgt]
            if unknown:
                raise ValueError(f"MERGE: UPDATE SET on unknown column(s) {unknown}")

    if upds:
        # Cardinality guard (Iceberg: MERGE_CARDINALITY_VIOLATION). With
        # a WHEN MATCHED clause, more than one source row per matched
        # target row is ambiguous — Spark/Iceberg raise; silently writing
        # both rows would corrupt the key uniqueness every downstream
        # upsert/delete_keys assumes (exactly what the reference's
        # row-count + checksum integrity gate would catch after the
        # fact). Two stages so the happy path stays one aggregate over
        # the (small) source side with NO extra target read: only when
        # the source actually has duplicate keys do we semi-join them
        # against the target to tell matched duplicates (error, as
        # upstream) from unmatched ones (legal — each inserts).
        skeys = list(dict.fromkeys(src_keys))
        dup_keys = (
            src_df.groupBy(*skeys)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
            .drop("__n")
        )
        if dup_keys.limit(1).count():
            # semi-join on the FULL ON predicate (every (tk, sk) pair):
            # a source column bound to multiple target keys (ON t.a=s.k
            # AND t.b=s.k) must require BOTH equalities — checking a
            # deduped sk→tk map would flag duplicates that match no row
            tkeys = tread().select(
                *dict.fromkeys(tk for tk, _ in pairs)
            ).distinct()
            jc = None
            for tk, sk in pairs:
                term = dup_keys[sk] == tkeys[tk]
                jc = term if jc is None else (jc & term)
            if dup_keys.join(tkeys, jc, "left_semi").limit(1).count():
                raise ValueError(
                    f"MERGE INTO {db}.{tbl}: cardinality violation — more "
                    "than one source row matches a single target row on "
                    f"({', '.join(tgt_keys)}); deduplicate the source "
                    "(e.g. keep the latest row per key) before merging"
                )

    bys_full = byss[0] if byss else None
    bys_cond = bys_full[0] if bys_full else None
    conditional = (
        len(upds) > 1 or len(inss) > 1 or len(byss) > 1
        or any(c is not None for c, _k, _p in upds + inss)
        # combinations the verb-level fast paths below don't express —
        # a conditional BY SOURCE alongside other clauses, multiple
        # ordered BY SOURCE clauses, and MATCHED DELETE alongside
        # INSERT / BY SOURCE — route through the clause machinery so
        # they stay ONE commit
        or (bys_cond is not None and bool(upds or inss))
        or (bool(upds) and upds[0][1] == "delete" and bool(inss or byss))
    )
    upd = (upds[0][1], upds[0][2]) if upds else None
    ins = (inss[0][1], inss[0][2]) if inss else None
    bys = (bys_full[1], bys_full[2]) if bys_full else None

    def rename_keys(df: DataFrame) -> DataFrame:
        for tk, sk in pairs:
            if sk != tk:
                if tk in df.columns:
                    raise ValueError(
                        f"MERGE: cannot map source key {sk!r} onto target key "
                        f"{tk!r} — the source already has a column named {tk!r}"
                    )
                df = df.withColumnRenamed(sk, tk)
        return df

    def require_full_schema(df: DataFrame, star: str) -> DataFrame:
        missing = [c for c in tgt if c not in df.columns]
        if missing:
            raise ValueError(
                f"MERGE INTO {db}.{tbl}: source is missing target column(s) "
                f"{missing} ({star} needs the full target schema)"
            )
        return df.select(*tgt)

    def src_keys_df() -> DataFrame:
        """The source's key set under the TARGET key names."""
        return (
            rename_keys(src_df.select(*dict.fromkeys(src_keys)))
            .select(*tgt_keys).distinct()
        )

    s_a = s_alias or "__src"

    if conditional:
        # ordered conditional clauses (the CDC-apply shape): matched
        # rows route to the FIRST clause whose condition holds (no
        # clause → untouched); same for not-matched source rows.
        # Updates and inserts union into ONE upsert; routed DELETEs
        # ride the same commit as extra delete keys (COW: their files
        # join the rewrite set; MOR: they join the equality-delete
        # key set). A BY SOURCE clause composes the same way: its
        # DELETE keys (target rows with no source match, optionally
        # condition-filtered) join the delete-key set, its UPDATE SET
        # rows join the upsert parts — the full CDC-plus-prune
        # statement stays ONE commit.
        existing = tread().select(
            *[F.col(tk).alias(sk) for tk, sk in pairs]
        ).distinct()
        parts: list[DataFrame] = []
        del_parts: list[DataFrame] = []
        if upds:
            join_cond = None
            for tk, sk in pairs:
                term = F.col(f"{t_alias}.{tk}") == F.col(f"{s_a}.{sk}")
                join_cond = term if join_cond is None else (join_cond & term)
            joined = tread().alias(t_alias).join(
                src_df.alias(s_a), join_cond, "inner"
            )
            route = None
            for i, (cond, _k, _p) in enumerate(upds):
                c = F.expr(cond) if cond is not None else F.lit(True)
                route = F.when(c, F.lit(i)) if route is None else route.when(c, F.lit(i))
            routed = joined.withColumn("__clause", route)
            for i, (_c, kind, payload) in enumerate(upds):
                rows = routed.where(F.col("__clause") == i)
                if kind == "delete":
                    del_parts.append(
                        rows.select(
                            *[F.col(f"{t_alias}.{tk}").alias(tk) for tk in tgt_keys]
                        )
                    )
                elif kind == "update_set":
                    parts.append(
                        rows.select(
                            *[
                                F.expr(payload[f.name]).cast(f.dataType).alias(f.name)
                                if f.name in payload
                                else F.col(f"{t_alias}.{f.name}").alias(f.name)
                                for f in schema.fields
                            ]
                        )
                    )
                else:  # update_star: keys from the target, rest by name
                    missing = [
                        c2 for c2 in tgt
                        if c2 not in tgt_keys and c2 not in src_df.columns
                    ]
                    if missing:
                        raise ValueError(
                            f"MERGE INTO {db}.{tbl}: source is missing target "
                            f"column(s) {missing} (UPDATE SET * needs the full "
                            "target schema)"
                        )
                    parts.append(
                        rows.select(
                            *[
                                F.col(f"{t_alias}.{f.name}").alias(f.name)
                                if f.name in tgt_keys
                                else F.col(f"{s_a}.{f.name}")
                                .cast(f.dataType).alias(f.name)
                                for f in schema.fields
                            ]
                        )
                    )
        if inss:
            unmatched = src_df.join(existing, src_keys, "left_anti").alias(s_a)
            iroute = None
            for j, (cond, _k, _p) in enumerate(inss):
                c = F.expr(cond) if cond is not None else F.lit(True)
                iroute = (
                    F.when(c, F.lit(j)) if iroute is None else iroute.when(c, F.lit(j))
                )
            irouted = unmatched.withColumn("__clause", iroute)
            for j, (_c, kind, payload) in enumerate(inss):
                rows = irouted.where(F.col("__clause") == j).drop("__clause")
                if kind == "insert_star":
                    parts.append(require_full_schema(rename_keys(rows), "INSERT *"))
                else:
                    parts.append(
                        rows.select(
                            *[
                                F.expr(payload[f.name]).cast(f.dataType).alias(f.name)
                                if f.name in payload
                                else F.lit(None).cast(f.dataType).alias(f.name)
                                for f in schema.fields
                            ]
                        )
                    )
        if byss:
            # ordered BY SOURCE clauses route like MATCHED ones: each
            # unmatched-by-source target row goes to the FIRST clause
            # whose condition holds (none → untouched); conditions see
            # only the target alias (there is no source row)
            bys_rows = tread().join(
                src_keys_df(), tgt_keys, "left_anti"
            ).alias(t_alias)
            broute = None
            for i, (cond, _k, _p) in enumerate(byss):
                c = F.expr(cond) if cond is not None else F.lit(True)
                broute = (
                    F.when(c, F.lit(i)) if broute is None else broute.when(c, F.lit(i))
                )
            brouted = bys_rows.withColumn("__clause", broute)
            for i, (_c, bkind, bpayload) in enumerate(byss):
                rows = brouted.where(F.col("__clause") == i).drop("__clause")
                if bkind == "delete":
                    del_parts.append(rows.select(*tgt_keys).distinct())
                else:  # update_set: condition-failing rows stay untouched
                    parts.append(
                        rows.select(
                            *[
                                F.expr(bpayload[f.name]).cast(f.dataType).alias(f.name)
                                if f.name in bpayload
                                else F.col(f"{t_alias}.{f.name}").alias(f.name)
                                for f in schema.fields
                            ]
                        )
                    )
        delkeys = None
        if del_parts:
            delkeys = del_parts[0]
            for p in del_parts[1:]:
                delkeys = delkeys.unionByName(p)
            delkeys = delkeys.distinct()
        if not parts:  # delete-routed rows only
            snap = catalog.delete_keys(db, tbl, delkeys, key_cols=tgt_keys, mode=mode, branch=branch)
            return _dml_report(spark, "MERGE DELETE", db, tbl, snap)
        updates = parts[0]
        for p in parts[1:]:
            updates = updates.unionByName(p)
        kw = {"extra_delete_keys": delkeys} if delkeys is not None else {}
        if mode == "merge-on-read":
            snap = catalog.upsert_mor(db, tbl, updates, key_cols=tgt_keys, branch=branch, **kw)
        else:
            snap = catalog.upsert(db, tbl, updates, key_cols=tgt_keys, branch=branch, **kw)
        return _dml_report(spark, "MERGE", db, tbl, snap)

    if upd and upd[0] == "delete":
        # MATCHED DELETE + INSERT/BY SOURCE always routes through the
        # `conditional` clause machinery above — this path only sees
        # the standalone form
        assert ins is None and bys is None
        snap = catalog.delete_keys(
            db, tbl, src_keys_df(), key_cols=tgt_keys, mode=mode, branch=branch
        )
        return _dml_report(spark, "MERGE DELETE", db, tbl, snap)

    if bys == ("delete", None) and upd is None and ins is None:
        # standalone BY SOURCE DELETE — prune target rows with no
        # source match: one anti-join key set, one keyed delete in the
        # mode the table property selects; an AND condition (over the
        # target alias) filters the doomed rows
        doomed = tread().join(
            src_keys_df(), tgt_keys, "left_anti"
        ).alias(t_alias)
        if bys_cond is not None:
            doomed = doomed.where(F.expr(bys_cond))
        doomed = doomed.select(*tgt_keys).distinct()
        snap = catalog.delete_keys(db, tbl, doomed, key_cols=tgt_keys, mode=mode, branch=branch)
        return _dml_report(spark, "MERGE DELETE", db, tbl, snap)

    # fast path — the verbs' native semantics, no extra target read
    if upd == ("update_star", None) and ins == ("insert_star", None) and bys is None:
        updates = require_full_schema(rename_keys(src_df), "UPDATE SET * / INSERT *")
        if mode == "merge-on-read":
            snap = catalog.upsert_mor(db, tbl, updates, key_cols=tgt_keys, branch=branch)
        else:
            snap = catalog.upsert(db, tbl, updates, key_cols=tgt_keys, branch=branch)
        return _dml_report(spark, "MERGE", db, tbl, snap)

    # one target-key read drives the matched and not-matched sides;
    # keys are aliased to the SOURCE names so the semi/anti joins bind
    existing = tread().select(
        *[F.col(tk).alias(sk) for tk, sk in pairs]
    ).distinct()

    if upd is None and bys is None:  # insert-only: anti-join + plain append
        unmatched = src_df.join(existing, src_keys, "left_anti")
        if ins[0] == "insert_star":
            new_rows = require_full_schema(rename_keys(unmatched), "INSERT *")
        else:
            new_rows = unmatched.alias(s_a).select(
                *[
                    F.expr(ins[1][f.name]).cast(f.dataType).alias(f.name)
                    if f.name in ins[1]
                    else F.lit(None).cast(f.dataType).alias(f.name)
                    for f in schema.fields
                ]
            )
        snap = catalog.write(db, tbl, new_rows, mode="append", branch=branch)
        return _dml_report(spark, "MERGE INSERT", db, tbl, snap)

    parts: list[DataFrame] = []
    if upd is not None and upd[0] == "update_star":
        matched = src_df.join(existing, src_keys, "left_semi")
        parts.append(require_full_schema(rename_keys(matched), "UPDATE SET *"))
    elif upd is not None:  # update_set: target×source join, exprs see both
        join_cond = None
        for tk, sk in pairs:
            term = F.col(f"{t_alias}.{tk}") == F.col(f"{s_a}.{sk}")
            join_cond = term if join_cond is None else (join_cond & term)
        joined = tread().alias(t_alias).join(
            src_df.alias(s_a), join_cond, "inner"
        )
        parts.append(
            joined.select(
                *[
                    F.expr(upd[1][f.name]).cast(f.dataType).alias(f.name)
                    if f.name in upd[1]
                    else F.col(f"{t_alias}.{f.name}").alias(f.name)
                    for f in schema.fields
                ]
            )
        )
    if ins is not None:
        unmatched = src_df.join(existing, src_keys, "left_anti")
        if ins[0] == "insert_star":
            parts.append(require_full_schema(rename_keys(unmatched), "INSERT *"))
        else:
            parts.append(
                unmatched.alias(s_a).select(
                    *[
                        F.expr(ins[1][f.name]).cast(f.dataType).alias(f.name)
                        if f.name in ins[1]
                        else F.lit(None).cast(f.dataType).alias(f.name)
                        for f in schema.fields
                    ]
                )
            )
    if bys is not None and bys[0] == "update_set":
        # unmatched-by-source target rows, SET exprs (and an AND
        # condition) see the target alias; condition-failing rows
        # simply aren't in the updates — untouched
        untouched = tread().join(
            src_keys_df(), tgt_keys, "left_anti"
        ).alias(t_alias)
        if bys_cond is not None:
            untouched = untouched.where(F.expr(bys_cond))
        parts.append(
            untouched.select(
                *[
                    F.expr(bys[1][f.name]).cast(f.dataType).alias(f.name)
                    if f.name in bys[1]
                    else F.col(f"{t_alias}.{f.name}").alias(f.name)
                    for f in schema.fields
                ]
            )
        )

    if bys is not None and bys[0] == "delete":
        if bys_cond is not None:
            raise ValueError(
                "MERGE: a conditional BY SOURCE DELETE cannot combine with "
                "update/insert clauses — run it as its own MERGE statement"
            )
        # BY SOURCE DELETE combined with update/insert clauses: the
        # final table state is EXACTLY the union of the computed parts
        # (matched rows as updated — or kept verbatim when there is no
        # MATCHED clause — plus the inserts; every other row deleted),
        # so the statement is ONE overwrite commit stamped as a merge.
        # At scale this is the full-sync shape: rewriting the table is
        # the plan you want when most rows change; to prune without a
        # rewrite, use the standalone BY SOURCE DELETE form instead.
        if upd is None:
            kept = tread().join(src_keys_df(), tgt_keys, "left_semi")
            parts.insert(0, kept.select(*tgt))
        final = parts[0]
        for p in parts[1:]:
            final = final.unionByName(p)
        snap = catalog.write(db, tbl, final, mode="overwrite", operation="merge", branch=branch)
        return _dml_report(spark, "MERGE", db, tbl, snap)

    updates = parts[0]
    for p in parts[1:]:
        updates = updates.unionByName(p)
    if mode == "merge-on-read":
        snap = catalog.upsert_mor(db, tbl, updates, key_cols=tgt_keys, branch=branch)
    else:
        snap = catalog.upsert(db, tbl, updates, key_cols=tgt_keys, branch=branch)
    return _dml_report(spark, "MERGE", db, tbl, snap)


#: subquery opener inside a DML WHERE condition (masked scan — a
#: string literal containing "(select" never matches)
_COND_SUBQUERY = re.compile(r"\(\s*(?:SELECT|WITH)\b", re.IGNORECASE)


def _dml_cond(spark: SparkSession, catalog, cond: str | None) -> str:
    """Prepare a DELETE/UPDATE WHERE condition for the engine. A
    condition carrying a subquery (``id IN (SELECT …)``, ``EXISTS
    (…)``, a scalar ``(SELECT …)`` comparison — the CDC tombstone /
    GDPR-erasure shapes) gets its catalog table references bound to
    temp views here, so the engine can evaluate it in query context
    (``snapcat._with_match``); plain predicates pass through
    untouched."""
    if cond is None:
        return "true"
    if _COND_SUBQUERY.search(_mask_literals(cond)):
        return _bind_catalog_refs(spark, catalog, cond)
    return cond


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
        INSERT INTO db.t.branch_dev <select> → write(branch="dev")
          (Iceberg's identifier-based branch write; reads via
          FROM db.t.branch_dev / db.t.tag_v1 or VERSION AS OF 'dev')
        INSERT OVERWRITE db.t <select>   → write(mode="overwrite")
        CREATE TABLE [IF NOT EXISTS] db.t AS <select> → write on a
          fresh table (IF NOT EXISTS: existing table is a no-op)
        CREATE TABLE [IF NOT EXISTS] db.t2 LIKE db.t1 → metadata-only
          clone: schema + partition spec + properties, no data
        DELETE FROM db.t [WHERE <cond>]  → delete_where
          (mode from the target's ``write.delete.mode``)
        UPDATE db.t SET c = e, … [WHERE] → update_where
          (mode from the target's ``write.update.mode``)
        DELETE FROM db.t.branch_b … | UPDATE db.t.branch_b SET … |
          MERGE INTO db.t.branch_b … → branch-targeted row-level DML:
          the statement scans the BRANCH head and commits onto the
          branch ref only; main is untouched until CALL
          system.fast_forward publishes the branch
        TRUNCATE TABLE db.t → truncate_table (metadata-only commit:
          zero files referenced, nothing read or rewritten; history
          stays time-travelable)
        MERGE INTO db.t USING <src> ON <t.k = s.k [AND …]>
          WHEN MATCHED THEN UPDATE SET * | SET c = e, … | DELETE
          WHEN NOT MATCHED THEN INSERT * | INSERT (c,…) VALUES (e,…)
          WHEN NOT MATCHED BY SOURCE THEN DELETE | UPDATE SET c = e, …
          → upsert / upsert_mor / delete_keys / append / overwrite
          (key names may differ per side; strategy from the target's
          ``write.merge.mode`` property; see _merge_execute)
        CREATE TABLE db.t (<ddl cols>) [PARTITIONED BY (spec,…)]
          [TBLPROPERTIES ('k'='v',…)]  → create_table (G2-correct)
        CREATE [OR REPLACE] VIEW db.v [(col, …)] AS <select>
          | ALTER VIEW db.v AS <select> | DROP VIEW
          [IF EXISTS] db.v | SHOW VIEWS IN db → catalog views
          (≙ Iceberg view spec: stored text, re-planned per read,
          resolved recursively in any query; cycles reject; the
          column list renames the body's output positionally)
        ALTER TABLE db.t CREATE [OR REPLACE] BRANCH|TAG
          [IF NOT EXISTS] name [AS OF VERSION id]
          | REPLACE BRANCH|TAG name AS OF VERSION id
          | DROP BRANCH|TAG [IF EXISTS] name → ref DDL
          (create_branch / tag / drop_ref)
        CREATE NAMESPACE|DATABASE|SCHEMA [IF NOT EXISTS] db
          → create_namespace (the reference's stage-3 SQL form)
        DROP NAMESPACE|DATABASE|SCHEMA [IF EXISTS] db [CASCADE|RESTRICT]
          → drop_namespace (RESTRICT default: non-empty rejects loudly)
        ALTER TABLE db.t ADD COLUMNS (c type,…) | DROP COLUMN c
          | RENAME COLUMN a TO b | ALTER COLUMN c TYPE t
          → alter_table (metadata-only schema evolution)
        ALTER TABLE db.t ADD|DROP PARTITION FIELD <col|transform(col)>
          | REPLACE PARTITION FIELD <f> WITH <g>
          → alter_partition_spec (metadata-only partition evolution)
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
        db, tbl = _uq(m, "db"), _uq(m, "tbl")
        is_ctas = m.re is _DML_CTAS
        if is_ctas and catalog.table(db, tbl).exists():
            if m.group("ine"):  # IF NOT EXISTS: tolerated no-op, no write
                head = catalog.table(db, tbl).current_snapshot()
                return spark.createDataFrame(
                    [("CREATE TABLE AS", f"{db}.{tbl}",
                      head.snapshot_id if head else None, "noop")],
                    "statement string, table string, snapshot_id bigint, "
                    "operation string",
                )
            raise ValueError(f"CREATE TABLE AS: {db}.{tbl} already exists")
        if is_ctas and catalog.view_text(db, tbl) is not None:
            raise ValueError(f"CREATE TABLE AS: {db}.{tbl} is an existing VIEW")
        if is_ctas:
            _check_provider(m.group("using"), f"CREATE TABLE AS: {db}.{tbl}")
        how = "append" if is_ctas else m.group("how").lower()
        rest = m.group("rest")
        ins_cols: list[str] | None = None
        if not is_ctas and rest.lstrip().startswith("("):
            # `INSERT INTO t (a, b) <query>` — a leading paren group is
            # a COLUMN LIST only when it is a comma-separated list of
            # bare identifiers AND a query body follows it; anything
            # else (`INSERT INTO t (SELECT …)` is legal SQL too) is the
            # query itself. The paren scan is backtick/quote-aware, so
            # a quoted column name containing ')' parses whole, and the
            # identifier test never misreads a column literally named
            # `values`/`select` as a query keyword.
            body = rest.lstrip()
            close = _top_paren_close(body, 0)
            head = body[1:close] if close > 0 else ""
            tail = body[close + 1:] if close > 0 else ""
            parts_ = [c.strip() for c in _split_top(head)]
            if (
                close > 0 and tail.strip() and head.strip()
                and all(re.fullmatch(_QIDENT, c) for c in parts_)
            ):
                ins_cols = [_unquote(c) for c in parts_]
                rest = tail
        if not is_ctas and not re.match(
            r"^\s*(?:\(|SELECT|VALUES|WITH|TABLE|FROM|MAP|REDUCE)\b",
            rest, re.IGNORECASE,
        ):
            # a body that isn't a query (INSERT … PARTITION (k=1) …,
            # INSERT … REPLACE WHERE …) must reject with the cause,
            # not die parsing the remainder as a SELECT
            raise ValueError(
                f"INSERT {how.upper()} {db}.{tbl}: unsupported body "
                f"starting at {rest.strip()[:40]!r} — expected a query "
                "(SELECT/VALUES/WITH); static PARTITION clauses are not "
                "supported (partitioning is declarative via the table spec)"
            )
        df = snapcat_sql(spark, catalog, rest)
        t = catalog.table(db, tbl)
        if not is_ctas and not t.exists():
            # ANSI: INSERT never creates — a typo'd name must fail
            # loud, not silently materialize a new table
            if catalog.view_text(db, tbl) is not None:
                raise ValueError(
                    f"INSERT {how.upper()}: {db}.{tbl} is a VIEW (read-only)"
                )
            raise LookupError(
                f"INSERT {how.upper()}: {db}.{tbl} does not exist "
                "(use CREATE TABLE ... AS to create)"
            )
        if not is_ctas and t.current_snapshot() is not None:
            # ANSI INSERT maps the select list POSITIONALLY onto the
            # target schema (a bare VALUES clause arrives as colN
            # names; a by-name merge would silently append new
            # columns instead — found by a VALUES round-trip test).
            # With an explicit column list, the select list maps onto
            # THOSE columns and every unnamed target column gets a
            # typed NULL.
            schema = t.schema()
            tgt = [f.name for f in schema.fields]
            if ins_cols is not None:
                unknown = [c for c in ins_cols if c not in tgt]
                if unknown:
                    raise ValueError(
                        f"INSERT {how.upper()} {db}.{tbl}: unknown "
                        f"column(s) {unknown} in the column list"
                    )
                if len(set(ins_cols)) != len(ins_cols):
                    raise ValueError(
                        f"INSERT {how.upper()} {db}.{tbl}: duplicate "
                        "column in the column list"
                    )
                if len(df.columns) != len(ins_cols):
                    raise ValueError(
                        f"INSERT {how.upper()} {db}.{tbl}: select list has "
                        f"{len(df.columns)} column(s), column list names "
                        f"{len(ins_cols)}"
                    )
                named = df.toDF(*ins_cols)
                df = named.select(
                    *[
                        F.col(f.name).cast(f.dataType).alias(f.name)
                        if f.name in ins_cols
                        else F.lit(None).cast(f.dataType).alias(f.name)
                        for f in schema.fields
                    ]
                )
            else:
                if len(df.columns) != len(tgt):
                    raise ValueError(
                        f"INSERT {how.upper()} {db}.{tbl}: select list has "
                        f"{len(df.columns)} column(s), target has {len(tgt)}"
                    )
                df = df.toDF(*tgt)
        elif ins_cols is not None:
            raise ValueError(
                f"INSERT {how.upper()} {db}.{tbl}: a column list needs an "
                "existing table schema to map onto"
            )
        ctas_spec = (
            [p.strip() for p in _split_top(m.group("spec")) if p.strip()]
            if is_ctas and m.group("spec") is not None
            else None
        )
        # parse TBLPROPERTIES BEFORE the write: a malformed property
        # list must fail the statement up front, not leave a created,
        # populated table behind (ADVICE r13)
        ctas_props = (
            _prop_pairs(m.group("props")) if is_ctas and m.group("props") else None
        )
        # Iceberg branch write: INSERT INTO db.t.branch_dev …
        branch = m.groupdict().get("branch")
        snap = catalog.write(
            db, tbl, df, mode="overwrite" if how == "overwrite" else "append",
            partition_by=ctas_spec,
            branch=branch.split("_", 1)[1] if branch else None,
        )
        if ctas_props:
            catalog.set_properties(db, tbl, ctas_props)
        stmt = "CREATE TABLE AS" if is_ctas else f"INSERT {how.upper()}"
        return _dml_report(spark, stmt, db, tbl, snap)
    masked_q = _mask_literals(query)
    m = _DML_MERGE_HEAD.match(masked_q)
    if m:
        return _merge_execute(spark, catalog, query, masked_q, m)
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
            sets[_unquote(col.strip())] = expr.strip()
        udb, utbl = _unquote(orig("db")), _unquote(orig("tbl"))
        ubranch = orig("branch")
        ubranch = ubranch.split("_", 1)[1] if ubranch else None
        ucond = _dml_cond(spark, catalog, orig("cond"))
        ut = catalog.table(udb, utbl)
        # Iceberg's row-level-strategy switch for UPDATE (completing
        # the mode family: MERGE write.merge.mode, DELETE
        # write.delete.mode): copy-on-write rewrites the matched
        # files; merge-on-read position-deletes the matched rows and
        # appends the updated versions in ONE commit, rewriting nothing
        umode = (
            ut.properties().get("write.update.mode", "copy-on-write")
            if ut.exists()
            else "copy-on-write"  # update_where raises its LookupError
        )
        snap = catalog.update_where(udb, utbl, ucond, sets, mode=umode, branch=ubranch)
        return _dml_report(spark, "UPDATE", udb, utbl, snap)
    m = _DML_DELETE.match(query)
    if m:
        db, tbl = _uq(m, "db"), _uq(m, "tbl")
        branch = m.group("branch")
        branch = branch.split("_", 1)[1] if branch else None
        t = catalog.table(db, tbl)
        # Iceberg's row-level-strategy switch for DELETE (the twin of
        # MERGE's write.merge.mode and UPDATE's write.update.mode):
        # copy-on-write rewrites the matched files, merge-on-read
        # records position deletes and rewrites nothing.
        mode = (
            t.properties().get("write.delete.mode", "copy-on-write")
            if t.exists()
            else "copy-on-write"  # delete_where raises its LookupError
        )
        snap = catalog.delete_where(
            db, tbl, _dml_cond(spark, catalog, m.group("cond")), mode=mode,
            branch=branch,
        )
        return _dml_report(spark, "DELETE", db, tbl, snap)
    m = _DML_TRUNCATE.match(query)
    if m:
        db, tbl = _uq(m, "db"), _uq(m, "tbl")
        if not catalog.table(db, tbl).exists():
            raise LookupError(f"TRUNCATE TABLE: {db}.{tbl} does not exist")
        snap = catalog.truncate_table(db, tbl)
        return _dml_report(spark, "TRUNCATE TABLE", db, tbl, snap)
    m = _DML_DROP.match(query)
    if m:
        db, tbl = _uq(m, "db"), _uq(m, "tbl")
        if not catalog.table(db, tbl).exists():
            if m.group("ie"):  # DROP TABLE IF EXISTS: tolerated no-op
                return spark.createDataFrame(
                    [("DROP TABLE", f"{db}.{tbl}")],
                    "statement string, table string",
                )
            raise LookupError(f"DROP TABLE: {db}.{tbl} does not exist")
        catalog.drop_table(db, tbl)
        return spark.createDataFrame(
            [("DROP TABLE", f"{db}.{tbl}")],
            "statement string, table string",
        )
    m = _DML_CREATE_VIEW.match(query) or _DML_ALTER_VIEW.match(query)
    if m:
        db, tbl = _uq(m, "db"), _uq(m, "tbl")
        is_alter = m.re is _DML_ALTER_VIEW
        if is_alter:
            # ALTER VIEW requires the view to exist (and must not be
            # pointed at a TABLE by mistake)
            if catalog.table(db, tbl).exists():
                raise ValueError(f"ALTER VIEW: {db}.{tbl} is a TABLE")
            if catalog.view_text(db, tbl) is None:
                raise LookupError(f"ALTER VIEW: view {db}.{tbl} does not exist")
        body = m.group("rest").strip().rstrip(";").strip()
        cols_text = None if is_alter else m.group("cols")
        if cols_text is not None:
            # CREATE VIEW db.v (alias, …) AS <query>: the column alias
            # list renames the body's output positionally (ANSI). The
            # stored text wraps the body so every later read re-plans
            # it under the aliased names.
            aliases = [c.strip() for c in _split_top(cols_text)]
            if not all(re.fullmatch(_QIDENT, a) for a in aliases):
                raise ValueError(
                    f"CREATE VIEW {db}.{tbl}: column list must be plain "
                    f"identifiers, got ({cols_text.strip()})"
                )
            src_cols = snapcat_sql(spark, catalog, body).columns
            if len(aliases) != len(src_cols):
                raise ValueError(
                    f"CREATE VIEW {db}.{tbl}: column list names "
                    f"{len(aliases)} column(s), query produces {len(src_cols)}"
                )
            sel = ", ".join(
                "`{}` AS `{}`".format(
                    s.replace("`", "``"), _unquote(a).replace("`", "``")
                )
                for s, a in zip(src_cols, aliases)
            )
            body = f"SELECT {sel} FROM ({body}) __view_body"
        # validate NOW (plan the text once) so a typo'd view fails at
        # CREATE/ALTER, not at first read; only the TEXT is stored —
        # the view re-plans against current table state on every read
        snapcat_sql(spark, catalog, body)
        catalog.create_view(
            db, tbl, body,
            replace=is_alter or m.group("replace") is not None,
        )
        return spark.createDataFrame(
            [("ALTER VIEW" if is_alter else "CREATE VIEW", f"{db}.{tbl}")],
            "statement string, view string",
        )
    m = _DML_DROP_VIEW.match(query)
    if m:
        db, tbl = _uq(m, "db"), _uq(m, "tbl")
        catalog.drop_view(db, tbl, missing_ok=m.group("ie") is not None)
        return spark.createDataFrame(
            [("DROP VIEW", f"{db}.{tbl}")], "statement string, view string"
        )
    m = _DML_SHOW_VIEWS.match(query)
    if m:
        return spark.createDataFrame(
            [(_uq(m, "db"), v) for v in catalog.list_views(_uq(m, "db"))]
            or spark.sparkContext.emptyRDD(),
            "namespace string, viewName string",
        )
    m = _DML_CREATE_NS.match(query)
    if m:
        db = _uq(m, "db")
        catalog.create_namespace(db, exists_ok=m.group("ine") is not None)
        return spark.createDataFrame(
            [("CREATE NAMESPACE", db)], "statement string, namespace string"
        )
    m = _DML_DROP_NS.match(query)
    if m:
        db = _uq(m, "db")
        catalog.drop_namespace(
            db,
            missing_ok=m.group("ie") is not None,
            cascade=(m.group("mode") or "").upper() == "CASCADE",
        )
        return spark.createDataFrame(
            [("DROP NAMESPACE", db)], "statement string, namespace string"
        )
    m = _DML_SHOW_TABLES.match(query)
    if m:
        return spark.createDataFrame(
            [(_uq(m, "db"), t) for t in catalog.list_tables(_uq(m, "db"))]
            or spark.sparkContext.emptyRDD(),
            "namespace string, tableName string",
        )
    if _DML_SHOW_NS.match(query):
        # list_namespaces itself filters internal _-prefixed dirs
        return spark.createDataFrame(
            [(ns,) for ns in catalog.list_namespaces()],
            "namespace string",
        )
    m = _DML_DESCRIBE.match(query)
    if m:
        t = catalog.table(_uq(m, "db"), _uq(m, "tbl"))
        if not t.exists():
            vtext = catalog.view_text(_uq(m, "db"), _uq(m, "tbl"))
            if vtext is not None:  # DESCRIBE a view: its planned schema
                return spark.createDataFrame(
                    [
                        (f.name, f.dataType.simpleString(), False)
                        for f in snapcat_sql(spark, catalog, vtext).schema.fields
                    ],
                    "col_name string, data_type string, is_partition boolean",
                )
            raise LookupError(
                f"DESCRIBE: {_uq(m, 'db')}.{_uq(m, 'tbl')} does not exist"
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
            _uq(m, "db"), _uq(m, "tbl"), _uq(m, "db2"), _uq(m, "tbl2")
        )
        return spark.createDataFrame(
            [("RENAME TABLE",
              f"{_uq(m, 'db')}.{_uq(m, 'tbl')} -> "
              f"{_uq(m, 'db2')}.{_uq(m, 'tbl2')}")],
            "statement string, table string",
        )
    m = _DML_SHOW_PROPS.match(query)
    if m:
        props = catalog.table(_uq(m, "db"), _uq(m, "tbl")).properties()
        return spark.createDataFrame(
            sorted(props.items()), "key string, value string"
        )
    m = _DML_SHOW_CREATE.match(query)
    if m:
        # reconstructed DDL — the round-trip text a user would run to
        # recreate the table on another catalog (schema from the
        # current snapshot's G1-correct DDL, spec and properties from
        # first-class metadata)
        t = catalog.table(_uq(m, "db"), _uq(m, "tbl"))
        if not t.exists():
            vtext = catalog.view_text(_uq(m, "db"), _uq(m, "tbl"))
            if vtext is not None:  # round-trips a VIEW as its DDL
                return spark.createDataFrame(
                    [(f"CREATE VIEW {_uq(m, 'db')}.{_uq(m, 'tbl')} AS {vtext}",)],
                    "createtab_stmt string",
                )
            raise LookupError(
                f"SHOW CREATE TABLE: {_uq(m, 'db')}.{_uq(m, 'tbl')} does not exist"
            )
        snap = t.current_snapshot() or t.snapshots()[-1]
        stmt = f"CREATE TABLE {_uq(m, 'db')}.{_uq(m, 'tbl')} ({snap.schema_ddl})"
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
        return catalog.table(_uq(m, "db"), _uq(m, "tbl")).partitions_df(spark)
    m = _DML_CREATE_LIKE.match(query)
    if m:
        # CREATE TABLE db.t2 LIKE db.t1 — metadata-only clone: current
        # schema, partition spec and table properties; no data, no
        # history (the reference's stage-3 destination-table shape)
        db, tbl = _uq(m, "db"), _uq(m, "tbl")
        sdb, stbl = _uq(m, "db2"), _uq(m, "tbl2")
        src = catalog.table(sdb, stbl)
        if not src.exists():
            if catalog.view_text(sdb, stbl) is not None:
                raise ValueError(
                    f"CREATE TABLE LIKE: {sdb}.{stbl} is a VIEW (clone the "
                    "table it reads, or CREATE VIEW instead)"
                )
            raise LookupError(f"CREATE TABLE LIKE: {sdb}.{stbl} does not exist")
        if catalog.view_text(db, tbl) is not None:
            raise ValueError(f"CREATE TABLE LIKE: {db}.{tbl} is an existing VIEW")
        if catalog.table(db, tbl).exists():
            if m.group("ine"):
                return spark.createDataFrame(
                    [("CREATE TABLE LIKE", f"{db}.{tbl}", f"{sdb}.{stbl}")],
                    "statement string, table string, source string",
                )
            raise ValueError(f"CREATE TABLE LIKE: {db}.{tbl} already exists")
        snap = src.current_snapshot() or src.snapshots()[-1]
        catalog.create_table(
            db, tbl, snap.schema_ddl,
            partition_by=list(snap.partition_spec),
            properties=src.properties(),
        )
        return spark.createDataFrame(
            [("CREATE TABLE LIKE", f"{db}.{tbl}", f"{sdb}.{stbl}")],
            "statement string, table string, source string",
        )
    m = _DML_CREATE.match(query)
    if m:
        # CREATE TABLE db.t (<DDL cols>) [PARTITIONED BY (spec,…)]
        #   [TBLPROPERTIES ('k'='v',…)] — W2 as SQL (partition spec
        # survives creation, fixing reference gap G2 on this surface
        # too); the column list is Spark DDL text, handed to the
        # engine's schema parser verbatim
        db, tbl = _uq(m, "db"), _uq(m, "tbl")
        if catalog.table(db, tbl).exists():
            if m.group("ine"):  # IF NOT EXISTS: tolerated no-op
                return spark.createDataFrame(
                    [("CREATE TABLE", f"{db}.{tbl}", "", 0)],
                    "statement string, table string, partition_spec string, "
                    "n_properties int",
                )
            raise ValueError(f"CREATE TABLE: {db}.{tbl} already exists")
        if catalog.view_text(db, tbl) is not None:
            raise ValueError(f"CREATE TABLE: {db}.{tbl} is an existing VIEW")
        _check_provider(m.group("using"), f"CREATE TABLE: {db}.{tbl}")
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
            _uq(m, "db"), _uq(m, "tbl"),
            rename_columns={_uq(m, "old"): _uq(m, "new")},
        )
        return _dml_report(
            spark, "ALTER TABLE RENAME COLUMN", _uq(m, "db"), _uq(m, "tbl"), snap
        )
    m = _DML_ALTER_TYPE.match(query)
    if m:
        snap = catalog.alter_table(
            _uq(m, "db"), _uq(m, "tbl"),
            widen_columns={_uq(m, "col"): m.group("type").strip()},
        )
        return _dml_report(
            spark, "ALTER TABLE ALTER COLUMN TYPE", _uq(m, "db"), _uq(m, "tbl"), snap
        )
    m = _DML_ALTER_REF.match(query)
    if m:
        # branch/tag DDL (≙ Iceberg's SQL extension; API twins:
        # snapcat.create_branch / tag / drop_ref). Semantics: CREATE
        # rejects an existing ref (IF NOT EXISTS no-ops, OR REPLACE
        # re-points), bare REPLACE requires one, DROP rejects a
        # missing ref (IF EXISTS no-ops) and a kind mismatch (a tag
        # can't be dropped as a branch).
        db, tbl = _uq(m, "db"), _uq(m, "tbl")
        ref = _uq(m, "ref")
        kind = m.group("kind").lower()
        op = re.sub(r"\s+", " ", m.group("op").upper())
        t = catalog.table(db, tbl)
        if not t.exists():
            raise LookupError(
                f"ALTER TABLE {op} {kind.upper()}: {db}.{tbl} does not exist"
            )
        refs = t.refs()
        existing_kind = refs.get(ref, {}).get("type")
        ver = int(m.group("ver")) if m.group("ver") else None
        stmt = f"ALTER TABLE {op} {kind.upper()}"

        def report(sid) -> DataFrame:
            return spark.createDataFrame(
                [(stmt, f"{db}.{tbl}", ref, sid)],
                "statement string, table string, ref string, snapshot_id bigint",
            )

        if op == "DROP":
            if existing_kind is None:
                if m.group("ie"):
                    return report(None)
                raise LookupError(
                    f"{stmt}: ref {ref!r} not found in {db}.{tbl}"
                )
            if existing_kind != kind:
                raise ValueError(
                    f"{stmt}: {ref!r} is a {existing_kind}, not a {kind}"
                )
            sid = refs[ref]["snapshot_id"]
            catalog.drop_ref(db, tbl, ref)
            return report(sid)
        if existing_kind is not None:
            if m.group("ine"):
                return report(refs[ref]["snapshot_id"])
            if "REPLACE" not in op:
                raise ValueError(
                    f"{stmt}: ref {ref!r} already exists in {db}.{tbl} "
                    "(use CREATE OR REPLACE to re-point it)"
                )
            if existing_kind != kind:
                raise ValueError(
                    f"{stmt}: {ref!r} is a {existing_kind}, not a {kind}"
                )
        elif op == "REPLACE":
            raise LookupError(
                f"{stmt}: ref {ref!r} not found in {db}.{tbl} "
                "(use CREATE to make a new one)"
            )
        if kind == "tag":
            sid = catalog.tag(db, tbl, ref, snapshot_id=ver)
        else:
            if existing_kind is not None:  # OR REPLACE on a branch
                catalog.drop_ref(db, tbl, ref)
            sid = catalog.create_branch(db, tbl, ref, snapshot_id=ver)
        return report(sid)
    m = _DML_ALTER_PART_REPL.match(query) or _DML_ALTER_PART.match(query)
    if m:
        # partition evolution (≙ Iceberg ALTER TABLE … ADD/DROP/REPLACE
        # PARTITION FIELD): compute the new FULL spec from the current
        # one and commit it metadata-only via alter_partition_spec —
        # existing files keep their own layout, future writes follow
        # the new spec
        from apache_iceberg_tables_migration_tool_spark.sources.snapcat import (
            parse_spec_field,
        )

        db, tbl = _uq(m, "db"), _uq(m, "tbl")
        t = catalog.table(db, tbl)
        if not t.exists():
            raise LookupError(
                f"ALTER TABLE PARTITION FIELD: {db}.{tbl} does not exist"
            )

        def skey(txt: str) -> tuple:
            f = parse_spec_field(_unquote(txt.strip()))
            return (f.kind, _unquote(f.source), f.param)

        cur = t.partition_spec()
        cur_keys = [skey(s) for s in cur]
        if m.re is _DML_ALTER_PART_REPL:
            old_k = skey(m.group("old"))
            if old_k not in cur_keys:
                raise ValueError(
                    f"REPLACE PARTITION FIELD: {m.group('old').strip()!r} "
                    f"is not in the current spec {cur}"
                )
            new_spec = [
                m.group("new").strip() if k == old_k else s
                for s, k in zip(cur, cur_keys)
            ]
            stmt = "ALTER TABLE REPLACE PARTITION FIELD"
        elif m.group("op").upper() == "ADD":
            if skey(m.group("field")) in cur_keys:
                raise ValueError(
                    f"ADD PARTITION FIELD: {m.group('field').strip()!r} "
                    "is already in the spec"
                )
            new_spec = cur + [m.group("field").strip()]
            stmt = "ALTER TABLE ADD PARTITION FIELD"
        else:
            k = skey(m.group("field"))
            if k not in cur_keys:
                raise ValueError(
                    f"DROP PARTITION FIELD: {m.group('field').strip()!r} "
                    f"is not in the current spec {cur}"
                )
            new_spec = [s for s, ck in zip(cur, cur_keys) if ck != k]
            stmt = "ALTER TABLE DROP PARTITION FIELD"
        snap = catalog.alter_partition_spec(db, tbl, new_spec)
        return _dml_report(spark, stmt, db, tbl, snap)
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
            adds[_unquote(name.strip())] = dtype.strip()
        snap = catalog.alter_table(_uq(m, "db"), _uq(m, "tbl"), add_columns=adds)
        return _dml_report(
            spark, "ALTER TABLE ADD COLUMNS", _uq(m, "db"), _uq(m, "tbl"), snap
        )
    m = _DML_ALTER_DROP.match(query)
    if m:
        drops = [_unquote(c.strip()) for c in _split_top(m.group("cols")) if c.strip()]
        snap = catalog.alter_table(_uq(m, "db"), _uq(m, "tbl"), drop_columns=drops)
        return _dml_report(
            spark, "ALTER TABLE DROP COLUMNS", _uq(m, "db"), _uq(m, "tbl"), snap
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
        props = catalog.set_properties(_uq(m, "db"), _uq(m, "tbl"), updates)
        stmt = "ALTER TABLE UNSET TBLPROPERTIES" if m.group("unset") \
            else "ALTER TABLE SET TBLPROPERTIES"
        return spark.createDataFrame(
            [(stmt, f"{_uq(m, 'db')}.{_uq(m, 'tbl')}", len(props))],
            "statement string, table string, n_properties int",
        )
    m = _DML_CALL.match(_mask_literals(query))
    if m:
        return _call_procedure(spark, catalog, query, m)
    return _reject_unmatched_statement(catalog, query)


#: statement-shaped openers: if one of these starts the query AND the
#: text names an existing catalog table/view, falling through to the
#: read path can only produce a misleading Catalyst error
_STMT_HEAD = re.compile(
    r"^\s*(INSERT|UPDATE|DELETE|MERGE|TRUNCATE|ALTER|CREATE|DROP)\b",
    re.IGNORECASE,
)
#: Spark-native session-local objects the read path legitimately runs
#: (CREATE [OR REPLACE] [GLOBAL] TEMP/TEMPORARY VIEW|FUNCTION, DROP
#: TEMPORARY …) — never intercept these
_STMT_TEMP = re.compile(r"\b(?:TEMP|TEMPORARY)\s+(?:VIEW|FUNCTION|TABLE)\b", re.IGNORECASE)


def _reject_unmatched_statement(catalog, query: str) -> None:
    """Loud catch-all (verdict r13): a DML/DDL-shaped statement that
    NAMES a catalog table or view but matched no handler must fail
    with a message that points at the real cause — not fall through
    to the read path and die inside Catalyst with an unrelated error
    (`DELETE FROM db.t.tag_v1`, `ALTER VIEW db.v RENAME …`,
    `CREATE EXTERNAL TABLE db.t …`). Statements over session-local
    temp objects and plain reads still pass through (returns None)."""
    head = _STMT_HEAD.match(query)
    if not head:
        return None
    masked = _mask_literals(query)
    if _STMT_TEMP.search(masked):
        return None
    for dm in re.finditer(rf"({_QIDENT})\.({_QIDENT})", masked):
        db = _unquote(query[dm.start(1):dm.end(1)])
        tbl = _unquote(query[dm.start(2):dm.end(2)])
        is_view = (
            hasattr(catalog, "view_text")
            and catalog.view_text(db, tbl) is not None
        )
        if is_view or tbl in catalog.list_tables(db):
            kind = "view" if is_view else "table"
            raise ValueError(
                f"unsupported statement: this {head.group(1).upper()} form "
                f"is not recognized by the catalog SQL surface, but it names "
                f"the catalog {kind} {db}.{tbl} — check the statement shape "
                "(supported forms are listed in snapcat_dml's docstring); "
                "it was NOT run as a read"
            )
        if head.group(1).upper() in ("CREATE", "DROP") and db in (
            catalog.list_namespaces() if hasattr(catalog, "list_namespaces") else ()
        ):
            # a CREATE/DROP naming a NEW object inside an existing
            # catalog namespace (CREATE EXTERNAL TABLE db.x …) can
            # only die in Catalyst with SCHEMA_NOT_FOUND — the catalog
            # namespace isn't a Spark schema; reject with the cause
            raise ValueError(
                f"unsupported statement: this {head.group(1).upper()} form "
                f"is not recognized by the catalog SQL surface, but "
                f"{db}.{tbl} names the catalog namespace {db!r} — check "
                "the statement shape (supported forms are listed in "
                "snapcat_dml's docstring); it was NOT run as a read"
            )
    return None


def _check_provider(using: str | None, ctx: str) -> None:
    """A USING clause names the table provider; this engine stores
    parquet under Iceberg-shaped metadata, so `iceberg` and `parquet`
    are the honest spellings — anything else (csv, delta, jdbc) must
    fail loud, not silently materialize a different format."""
    if using is not None and using.lower() not in ("iceberg", "parquet"):
        raise ValueError(
            f"{ctx}: unsupported provider USING {using} "
            "(this catalog stores iceberg/parquet tables)"
        )


def _prop_pairs(text: str) -> dict[str, str]:
    """TBLPROPERTIES pair list: ``'k' = 'v', …`` — quoted literals with
    the same escape forms as everywhere else (``''`` doubled-quote AND
    backslash, via the escape-aware scanner + ``_call_literal``)."""
    out: dict[str, str] = {}
    for item in _split_top(text):
        item = item.strip()
        if not item:
            continue
        if not item.startswith("'"):
            raise ValueError(f"TBLPROPERTIES: cannot parse {item!r}")
        k_end = _scan_string(item, 0)
        rest = item[k_end + 1:].strip()
        if k_end >= len(item) or not rest.startswith("="):
            raise ValueError(f"TBLPROPERTIES: cannot parse {item!r}")
        val = rest[1:].strip()
        if not val.startswith("'") or _scan_string(val, 0) != len(val) - 1:
            raise ValueError(f"TBLPROPERTIES: cannot parse {item!r}")
        out[str(_call_literal(item[:k_end + 1]))] = str(_call_literal(val))
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
        db, tbl, rest = _call_table(pos, named)
        keep = named.get(  # retain_last = Iceberg's own spelling
            "keep_last", named.get("retain_last", rest[0] if rest else 1)
        )
        expired = catalog.expire_snapshots(
            db, tbl, keep_last=int(keep), older_than=named.get("older_than"),
        )
        return spark.createDataFrame(
            [(int(i),) for i in expired], "expired_snapshot_id bigint"
        )
    if proc == "remove_orphan_files":
        db, tbl, _rest = _call_table(pos, named)
        removed = catalog.remove_orphan_files(
            db, tbl, dry_run=bool(named.get("dry_run", False))
        )
        return spark.createDataFrame(
            [(p,) for p in removed], "orphan_file_location string"
        )
    if proc == "rollback_to_snapshot":
        db, tbl, rest = _call_table(pos, named)
        sid = named.get("snapshot_id", rest[0] if rest else None)
        if sid is None:
            raise ValueError("rollback_to_snapshot: snapshot_id required")
        snap = catalog.rollback(db, tbl, int(sid))
        return _dml_report(spark, "CALL rollback_to_snapshot", db, tbl, snap)
    if proc in ("cherrypick_snapshot", "publish"):
        db, tbl, rest = _call_table(pos, named)
        sid = named.get("snapshot_id", rest[0] if rest else None)
        if sid is None:
            raise ValueError(f"{proc}: snapshot_id required")
        snap = catalog.publish(db, tbl, int(sid))
        return _dml_report(spark, "CALL cherrypick_snapshot", db, tbl, snap)
    if proc == "fast_forward":
        db, tbl, rest = _call_table(pos, named)
        branch = named.get("branch", rest[0] if rest else None)
        if branch is None:
            raise ValueError("fast_forward: branch required")
        sid = catalog.fast_forward(db, tbl, str(branch))
        return spark.createDataFrame(
            [(f"{db}.{tbl}", str(branch), int(sid))],
            "table string, branch string, snapshot_id bigint",
        )
    if proc in ("rewrite_data_files", "compact"):
        db, tbl, _rest = _call_table(pos, named)
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
        db, tbl, rest = _call_table(pos, named)
        tag_name = named.get("tag", rest[0] if rest else None)
        if tag_name is None:
            raise ValueError("create_tag: tag name required")
        sid = catalog.tag(db, tbl, str(tag_name), snapshot_id=named.get("snapshot_id"))
        return spark.createDataFrame(
            [(f"{db}.{tbl}", str(tag_name), int(sid))],
            "table string, tag string, snapshot_id bigint",
        )
    if proc in ("analyze_table", "analyze"):
        db, tbl, _rest = _call_table(pos, named)
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
