"""Property-based tests (hypothesis): algebraic invariants that must
hold for ANY input, not just the fixtures — the strongest guard for
operators whose failure modes are data-shaped (ties, empty groups,
hot keys, negative values, duplicate timestamps)."""

from __future__ import annotations

from collections import Counter
from datetime import datetime, timedelta
from decimal import Decimal

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from apache_iceberg_tables_migration_tool_spark.functions.portable import dsum
from apache_iceberg_tables_migration_tool_spark.operators.asof import asof_join
from apache_iceberg_tables_migration_tool_spark.operators.integrity import table_checksum
from apache_iceberg_tables_migration_tool_spark.operators.skew import salted_agg
from tests.conftest import RUN_FULL

# Example budgets scale with the suite tier (r14 verdict #1: the
# full-fat suite outgrew the driver's pytest budget). The DEFAULT tier
# keeps every property in the suite at a reduced tape count — each
# invariant still executes end to end on randomized inputs every run —
# while SPARK_GRAFT_FULL_TESTS=1 restores the deep budgets used at
# round close.
_N = 8 if RUN_FULL else 2
_N_LIGHT = 25 if RUN_FULL else 4  # cheap non-Spark / single-job fuzzes
_SETTINGS = dict(max_examples=_N, deadline=None)

_BASE = datetime(2024, 1, 1)

# (key, minute-offset) event lists; duplicates and unsorted order allowed
_events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 500)), min_size=0, max_size=25
)


@given(left=_events, right=_events)
@settings(**_SETTINGS)
def test_asof_join_matches_python_reference(spark, left, right):
    """For every left row, the matched right row is the latest right
    row with the same key and ts ≤ left.ts (backward as-of)."""
    ldf = spark.createDataFrame(
        [(k, _BASE + timedelta(minutes=m), i) for i, (k, m) in enumerate(left)],
        "k int, ts timestamp, lid int",
    )
    rdf = spark.createDataFrame(
        [(k, _BASE + timedelta(minutes=m), i) for i, (k, m) in enumerate(right)],
        "k int, ts timestamp, rid int",
    )
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="ts").collect()
    }
    for i, (k, m) in enumerate(left):
        cands = [
            (rm, j) for j, (rk, rm) in enumerate(right) if rk == k and rm <= m
        ]
        # tie-break must match the operator: latest ts, then last row wins
        want = max(cands)[1] if cands else None
        assert got.get(i) == want, (i, k, m, cands)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-1000, 1000)), min_size=1, max_size=40
    ),
    buckets=st.sampled_from([1, 2, 7, 32]),
)
@settings(**_SETTINGS)
def test_salted_agg_equals_direct_groupby(spark, rows, buckets):
    df = spark.createDataFrame([(k, v, i) for i, (k, v) in enumerate(rows)], "k int, v long, rid long")
    direct = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
             F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_agg(
            df, keys=["k"],
            aggs={"n": ("1", "count"), "s": ("v", "sum"),
                  "mn": ("v", "min"), "mx": ("v", "max")},
            salt_cols=["rid"], salt_buckets=buckets,
        ).collect()
    }
    assert salted == direct


@given(
    rows=st.lists(
        st.tuples(st.integers(-100, 100), st.text(alphabet="abc", max_size=3)),
        min_size=1, max_size=20,
    ),
    seed=st.integers(0, 5),
)
@settings(**_SETTINGS)
def test_checksum_is_order_invariant_and_value_sensitive(spark, rows, seed):
    import random

    df1 = spark.createDataFrame(rows, "a int, b string").repartition(4)
    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)
    df2 = spark.createDataFrame(shuffled, "a int, b string").repartition(2)
    c1, c2 = table_checksum(df1), table_checksum(df2)
    assert c1 == c2  # row order and partitioning never affect the fingerprint
    tweaked = [(a + 1, b) for a, b in rows[:1]] + rows[1:]
    if sorted(tweaked) != sorted(rows):
        c3 = table_checksum(spark.createDataFrame(tweaked, "a int, b string"))
        assert c3 != c1


@given(
    vals=st.lists(
        st.decimals(
            min_value=Decimal("-99999.99"), max_value=Decimal("99999.99"), places=2
        ),
        min_size=1, max_size=30,
    )
)
@settings(**_SETTINGS)
def test_dsum_equals_exact_decimal_sum(spark, vals):
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = df.agg(dsum("v", scale=6).alias("s")).collect()[0]["s"]
    want = float(sum(vals))  # 2-dp decimals: exact in double, floor(×100) is identity
    assert got == want


# ops: 0 = published append, 1 = staged append, 2 = staged append then
# publish, 3 = overwrite, 4 = expire(keep_last=2)
_wap_ops = st.lists(st.integers(0, 4), min_size=1, max_size=8)


@given(ops=_wap_ops)
@settings(**_SETTINGS)
def test_wap_commit_protocol_invariants(spark, tmp_path_factory, ops):
    """For ANY interleaving of published appends, staged appends,
    publishes, overwrites, and expirations: the table state equals a
    simple Python model, snapshot ids never collide, and the
    published chain only contains published work."""
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    cat = SnapCatalog(str(tmp_path_factory.mktemp("wap_prop")))
    model: list[int] = []  # expected ids in the published table
    next_val = 0
    tbl = cat.table("db", "t")

    def batch(n=2):
        nonlocal next_val
        vals = list(range(next_val, next_val + n))
        next_val += n
        return vals

    for op in ops:
        if op == 0:
            vals = batch()
            cat.write("db", "t", spark.createDataFrame([(v,) for v in vals], "id long"))
            model.extend(vals)
        elif op == 1:
            cat.write(
                "db", "t",
                spark.createDataFrame([(v,) for v in batch()], "id long"),
                staged=True,
            )  # never published: invisible
        elif op == 2:
            vals = batch()
            s = cat.write(
                "db", "t",
                spark.createDataFrame([(v,) for v in vals], "id long"),
                staged=True,
            )
            cat.publish("db", "t", s.snapshot_id)
            model.extend(vals)
        elif op == 3:
            vals = batch()
            cat.write(
                "db", "t",
                spark.createDataFrame([(v,) for v in vals], "id long"),
                mode="overwrite",
            )
            model = list(vals)
        elif op == 4 and tbl.exists():
            cat.expire_snapshots("db", "t", keep_last=2)

    if not tbl.exists():
        return
    cur = tbl.current_snapshot()
    got = sorted(r["id"] for r in tbl.read(spark).collect()) if cur else []
    assert got == sorted(model)
    ids = [s.snapshot_id for s in tbl.snapshots()]
    assert len(ids) == len(set(ids)), f"snapshot id collision: {ids}"
    chain = tbl.main_chain()
    assert [s.snapshot_id for s in chain] == sorted(s.snapshot_id for s in chain)
    if cur:
        assert chain[-1].snapshot_id == cur.snapshot_id


# ---------------------------------------------------------------------------
# Join-view IVM: maintained view ≡ recompute over arbitrary two-sided tapes
# ---------------------------------------------------------------------------

# a tape of rounds; each op is (side_is_a, is_insert, join_key_idx, aux).
# Deletes resolve against that side's LIVE multiset, so every tape is a
# consistent two-sided insert/delete history; duplicate join keys on
# both sides exercise multiplicity (one delta row joins many matches).
_jv_tape = st.lists(
    st.lists(
        st.tuples(
            st.booleans(), st.booleans(), st.integers(0, 2), st.integers(-9, 9)
        ),
        min_size=1, max_size=8,
    ),
    min_size=1, max_size=4,
)


@given(tape=_jv_tape)
@settings(**_SETTINGS)
def test_join_view_ivm_equals_recompute_on_random_tapes(spark, tape):
    """join_delta + apply_agg_delta folded over ANY consistent
    two-sided insert/delete tape (duplicate join keys, null group
    keys, group death, same-round churn on both sides — the ΔA⋈ΔB
    cross term) equals grouped_aggregate recomputed from the surviving
    joined rows: the bilinearity law across the state space."""
    from apache_iceberg_tables_migration_tool_spark.operators import ivm

    groups = ["x", "y", None]
    a_schema = "k long, g string"
    b_schema = "k long, v long"

    live_a: list[tuple] = []
    live_b: list[tuple] = []
    view_rows: list = []
    view_schema = None

    def df(rows, schema):
        return spark.createDataFrame(rows, schema)

    for batch in tape:
        a_old, b_old = list(live_a), list(live_b)
        ch_a, ch_b = [], []
        for side_a, is_insert, kidx, aux in batch:
            live, ch = (live_a, ch_a) if side_a else (live_b, ch_b)
            if is_insert or not live:
                row = (kidx, groups[aux % 3]) if side_a else (kidx, aux)
                live.append(row)
                ch.append((*row, "insert"))
            else:
                row = live.pop(aux % len(live))
                ch.append((*row, "delete"))
        cl_a = df(ch_a, a_schema + ", _change_type string") if ch_a else None
        cl_b = df(ch_b, b_schema + ", _change_type string") if ch_b else None
        base = (
            df(view_rows, view_schema)
            if view_schema is not None
            else ivm.grouped_aggregate(
                df([], a_schema).join(df([], b_schema), ["k"]), ["g"], ["v"]
            )
        )
        jd = ivm.join_delta(cl_a, df(a_old, a_schema), cl_b, df(b_old, b_schema), ["k"])
        out = ivm.apply_agg_delta(
            base, ivm.agg_delta(jd, ["g"], ["v"]), ["g"], ["v"]
        )
        view_rows, view_schema = out.collect(), out.schema
        want = sorted(
            (tuple(r) for r in ivm.grouped_aggregate(
                df(live_a, a_schema).join(df(live_b, b_schema), ["k"]),
                ["g"], ["v"],
            ).collect()),
            key=repr,
        )
        assert sorted((tuple(r) for r in view_rows), key=repr) == want


# ---------------------------------------------------------------------------
# Top-k IVM: maintained leaderboard ≡ recompute over arbitrary tapes
# ---------------------------------------------------------------------------

# a tape of rounds; each op is (kind, group_idx, metric) with kind
# 0=insert new id, 1=delete an existing row, 2=update an existing row.
_tk_tape = st.lists(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2), st.integers(-20, 20)),
        min_size=1, max_size=7,
    ),
    min_size=1, max_size=4,
)


@given(tape=_tk_tape)
@settings(**_SETTINGS)
def test_topk_ivm_equals_recompute_on_random_tapes(spark, tape):
    """apply_topk_delta folded over ANY consistent unique-id tape of
    inserts, deletes and updates (metric ties, boundary churn,
    evicted-row resurrection, group death, intra-slice insert+delete
    of the same id) equals grouped_topk recomputed from the surviving
    rows."""
    from apache_iceberg_tables_migration_tool_spark.operators import ivm

    groups = ["x", "y", None]
    schema = "g string, id long, m long"
    cl_schema = schema + ", _change_type string, _commit_order int"

    live: dict[int, tuple] = {}
    next_id = 0
    view_rows: list = []
    view_schema = None
    for batch in tape:
        changes = []
        for order, (kind, gidx, metric) in enumerate(batch):
            if kind == 0 or not live:
                row = (groups[gidx], next_id, metric)
                live[next_id] = row
                next_id += 1
                changes.append((*row, "insert", order))
            else:
                victim = sorted(live)[metric % len(live)]
                old = live.pop(victim)
                changes.append((*old, "delete", order))
                if kind == 2:  # update: re-insert same id, new metric
                    row = (old[0], victim, metric)
                    live[victim] = row
                    changes.append((*row, "insert", order))
        base = (
            spark.createDataFrame(view_rows, view_schema)
            if view_schema is not None
            else ivm.grouped_topk(
                spark.createDataFrame([], schema), ["g"], "m", "id", 2
            )
        )
        cl = spark.createDataFrame(changes, cl_schema)
        cur = spark.createDataFrame(list(live.values()) or [], schema)
        out = ivm.apply_topk_delta(base, cl, cur, ["g"], "m", "id", 2)
        view_rows, view_schema = out.collect(), out.schema
        want = sorted(
            (tuple(r) for r in ivm.grouped_topk(
                cur, ["g"], "m", "id", 2).collect()),
            key=repr,
        )
        assert sorted((tuple(r) for r in view_rows), key=repr) == want


# ---------------------------------------------------------------------------
# MIN/MAX IVM: maintained view ≡ recompute over arbitrary commit tapes
# ---------------------------------------------------------------------------

# a tape of micro-batches; each op is (is_insert, key_idx, value).
# Deletes are resolved against the LIVE multiset (pick an existing row
# by index), so every tape is a consistent insert/delete history.
_mm_tape = st.lists(
    st.lists(
        st.tuples(st.booleans(), st.integers(0, 2), st.integers(-50, 50)),
        min_size=1, max_size=8,
    ),
    min_size=1, max_size=4,
)


@given(tape=_mm_tape)
@settings(**_SETTINGS)
def test_minmax_ivm_equals_recompute_on_random_tapes(spark, tape):
    """apply_minmax_delta folded over ANY consistent insert/delete
    tape (null keys, duplicate extrema, group death/rebirth, deletes
    that do and don't touch extrema) equals grouped_minmax recomputed
    from the surviving rows — the IVM ≡ recompute law the carrier
    query checks once, checked here across the state space."""
    from apache_iceberg_tables_migration_tool_spark.operators import ivm

    keys = ["a", "b", None]
    schema = "g string, v long"
    cl_schema = "g string, v long, _change_type string"

    live: list[tuple] = []
    view_rows: list = []
    view_schema = None
    for batch in tape:
        changes = []
        for is_insert, kidx, val in batch:
            if is_insert or not live:
                row = (keys[kidx], val)
                live.append(row)
                changes.append((*row, "insert"))
            else:
                row = live.pop(val % len(live))
                changes.append((*row, "delete"))
        base = (
            spark.createDataFrame(view_rows, view_schema)
            if view_schema is not None
            else ivm.grouped_minmax(spark.createDataFrame([], schema), ["g"], ["v"])
        )
        cl = spark.createDataFrame(changes, cl_schema)
        cur = spark.createDataFrame(live, schema) if live else \
            spark.createDataFrame([], schema)
        out = ivm.apply_minmax_delta(base, cl, cur, ["g"], ["v"])
        view_rows, view_schema = out.collect(), out.schema
        want = sorted(
            (tuple(r) for r in ivm.grouped_minmax(cur, ["g"], ["v"]).collect()),
            key=repr,
        )
        assert sorted((tuple(r) for r in view_rows), key=repr) == want


# ---------------------------------------------------------------------------
# Top-k over joins: maintained joined leaderboard ≡ recompute
# ---------------------------------------------------------------------------

# a tape of rounds; each op is (side_a, kind, k_idx, val):
#   A (dimension, pk = k ∈ {0,1,2}): kind 0 = upsert (insert, or
#     delete+insert moving the row's GROUP), kind 1+ = delete.
#   B (fact, pk = id): kind 0 = insert (k_idx, new id, val),
#     kind 1 = delete a live row, kind 2 = update a live row's metric.
_tkj_tape = st.lists(
    st.lists(
        st.tuples(
            st.booleans(), st.integers(0, 2), st.integers(0, 2),
            st.integers(-20, 20),
        ),
        min_size=1, max_size=7,
    ),
    min_size=1, max_size=3,
)


@given(tape=_tkj_tape)
@settings(**_SETTINGS)
def test_topk_join_ivm_equals_recompute_on_random_tapes(spark, tape):
    """join_delta + apply_topk_delta(collapse="net") folded over ANY
    consistent two-sided tape (dangling fact keys, dimension group
    moves, cross-term double deletes, metric ties, group death)
    equals grouped_topk recomputed over the surviving join."""
    from apache_iceberg_tables_migration_tool_spark.operators import ivm

    groups = ["x", "y", None]
    a_schema = "k long, g string"
    b_schema = "k long, id long, m long"

    def df(rows, schema):
        return spark.createDataFrame(rows, schema)

    live_a: dict[int, tuple] = {}
    live_b: dict[int, tuple] = {}
    next_id = 0
    view_rows: list = []
    view_schema = None
    for batch in tape:
        a_old = list(live_a.values())
        b_old = list(live_b.values())
        ch_a, ch_b = [], []
        for side_a, kind, kidx, val in batch:
            if side_a:
                if kind == 0:  # upsert: group move when k already live
                    if kidx in live_a:
                        ch_a.append((*live_a[kidx], "delete"))
                    row = (kidx, groups[val % 3])
                    live_a[kidx] = row
                    ch_a.append((*row, "insert"))
                elif kidx in live_a:
                    ch_a.append((*live_a.pop(kidx), "delete"))
            else:
                if kind == 0 or not live_b:
                    row = (kidx, next_id, val)
                    live_b[next_id] = row
                    next_id += 1
                    ch_b.append((*row, "insert"))
                else:
                    victim = sorted(live_b)[val % len(live_b)]
                    old = live_b.pop(victim)
                    ch_b.append((*old, "delete"))
                    if kind == 2:  # update metric, same pk
                        row = (old[0], victim, val)
                        live_b[victim] = row
                        ch_b.append((*row, "insert"))
        if not ch_a and not ch_b:
            continue
        cl_a = df(ch_a, a_schema + ", _change_type string") if ch_a else None
        cl_b = df(ch_b, b_schema + ", _change_type string") if ch_b else None
        base = (
            df(view_rows, view_schema)
            if view_schema is not None
            else ivm.grouped_topk(
                df([], a_schema).join(df([], b_schema), ["k"]),
                ["g"], "m", ["k", "id"], 2,
            )
        )
        jd = ivm.join_delta(cl_a, df(a_old, a_schema), cl_b, df(b_old, b_schema), ["k"])
        cur = df(list(live_a.values()), a_schema).join(
            df(list(live_b.values()), b_schema), ["k"]
        )
        out = ivm.apply_topk_delta(
            base, jd, cur, ["g"], "m", ["k", "id"], 2, collapse="net"
        )
        view_rows, view_schema = out.collect(), out.schema
        want = sorted(
            (tuple(r) for r in ivm.grouped_topk(
                cur, ["g"], "m", ["k", "id"], 2).collect()),
            key=repr,
        )
        assert sorted((tuple(r) for r in view_rows), key=repr) == want


# ---------------------------------------------------------------------------
# 3-way join-chain IVM: composed bilinearity ≡ recompute
# ---------------------------------------------------------------------------

# each op is (table 0|1|2, is_insert, key_idx, val); deletes resolve
# against the table's live multiset, so every tape is consistent.
# Duplicate rows, dangling keys and null groups are all reachable.
_chain_tape = st.lists(
    st.lists(
        st.tuples(
            st.integers(0, 2), st.booleans(), st.integers(0, 2),
            st.integers(-9, 9),
        ),
        min_size=1, max_size=7,
    ),
    min_size=1, max_size=3,
)


@given(tape=_chain_tape)
@settings(**_SETTINGS)
def test_join_chain_ivm_equals_recompute_on_random_tapes(spark, tape):
    """Feeding join_delta's output back in as the left changelog of
    the next step (the refresh_join_chain_view composition) stays
    exact over ANY consistent three-sided tape: the folded COUNT/SUM
    view equals a recompute over the surviving A ⋈ B ⋈ C."""
    from apache_iceberg_tables_migration_tool_spark.operators import ivm

    groups = ["x", "y", None]
    schemas = ["ja long, g string", "ja long, jb long", "jb long, v long"]

    def df(rows, schema):
        return spark.createDataFrame(rows, schema)

    def mkrow(t, kidx, val):
        if t == 0:
            return (kidx, groups[val % 3])
        if t == 1:
            return (kidx, val % 3)
        return (kidx, val)

    live: list[list[tuple]] = [[], [], []]
    view_rows: list = []
    view_schema = None
    for batch in tape:
        olds = [list(side) for side in live]
        chs: list[list[tuple]] = [[], [], []]
        for t, is_insert, kidx, val in batch:
            if is_insert or not live[t]:
                row = mkrow(t, kidx, val)
                live[t].append(row)
                chs[t].append((*row, "insert"))
            else:
                row = live[t].pop(val % len(live[t]))
                chs[t].append((*row, "delete"))
        cls = [
            df(chs[t], schemas[t] + ", _change_type string") if chs[t] else None
            for t in range(3)
        ]
        base = (
            df(view_rows, view_schema)
            if view_schema is not None
            else ivm.grouped_aggregate(
                df([], schemas[0]).join(df([], schemas[1]), ["ja"])
                .join(df([], schemas[2]), ["jb"]),
                ["g"], ["v"],
            )
        )
        l_cl, l_old = cls[0], df(olds[0], schemas[0])
        for step, on_s in ((1, ["ja"]), (2, ["jb"])):
            r_old = df(olds[step], schemas[step])
            if l_cl is not None or cls[step] is not None:
                l_cl = ivm.join_delta(l_cl, l_old, cls[step], r_old, on_s)
            l_old = l_old.join(r_old, on_s)
        out = ivm.apply_agg_delta(
            base, ivm.agg_delta(l_cl, ["g"], ["v"]), ["g"], ["v"]
        )
        view_rows, view_schema = out.collect(), out.schema
        want = sorted(
            (tuple(r) for r in ivm.grouped_aggregate(
                df(live[0], schemas[0]).join(df(live[1], schemas[1]), ["ja"])
                .join(df(live[2], schemas[2]), ["jb"]),
                ["g"], ["v"],
            ).collect()),
            key=repr,
        )
        assert sorted((tuple(r) for r in view_rows), key=repr) == want


# ---------------------------------------------------------------------------
# Multi-table transactions: atomicity under arbitrary crash points
# ---------------------------------------------------------------------------

# a tape of transactions; each is (ops, outcome) where ops is a list of
# (table_idx, lo, hi) appends and outcome ∈ {commit, abort, crash_at_j}
_txn_tape = st.lists(
    st.tuples(
        st.lists(st.tuples(st.integers(0, 2), st.integers(0, 3)), min_size=1,
                 max_size=3),
        st.integers(-2, 3),  # -2 abort, -1 clean commit, ≥0 crash after j
    ),
    min_size=1, max_size=4,
)


@given(tape=_txn_tape)
@settings(**_SETTINGS)
def test_txn_atomicity_under_random_crash_points(spark, tmp_path_factory, tape):
    """For ANY sequence of multi-table transactions with crashes
    injected after arbitrary publish counts: after recovery, every
    COMMITTED transaction is fully visible, every aborted or
    never-committed one fully invisible — no interleaving or crash
    point can produce a half-applied batch."""
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
    from apache_iceberg_tables_migration_tool_spark.sources.transactions import (
        MultiTableTransaction,
        TransactionRollForwardError,
        pending_transactions,
        recover_transactions,
    )

    root = tmp_path_factory.mktemp("txn_tape")
    cat = SnapCatalog(str(root / "wh"))
    model = {0: [], 1: [], 2: []}  # expected visible rows per table
    next_lo = [0]

    def _rows(tbl_idx, n):
        lo = next_lo[0]
        next_lo[0] += n + 1
        return list(range(lo, lo + n + 1))

    for ops, outcome in tape:
        txn = MultiTableTransaction(cat)
        staged: dict[int, list[int]] = {}
        for t_idx, n in ops:
            rows = _rows(t_idx, n)
            staged.setdefault(t_idx, []).extend(rows)
            txn.write(
                "db", f"t{t_idx}",
                spark.createDataFrame([(r,) for r in rows], "id bigint"),
            )
        if outcome == -2:
            txn.abort()
            continue
        if outcome == -1:
            txn.commit()
        else:
            real = cat.publish
            calls = {"n": 0}

            def flaky(*a, _real=real, _calls=calls, _stop=outcome, **kw):
                if _calls["n"] >= _stop:
                    raise RuntimeError("injected crash")
                _calls["n"] += 1
                return _real(*a, **kw)

            cat.publish = flaky
            try:
                txn.commit()
            except (TransactionRollForwardError, RuntimeError):
                pass
            finally:
                cat.publish = real
        # committed (cleanly or crashed mid-publish): the model gains
        # the rows; recovery must finish any crashed roll-forward
        recover_transactions(cat)
        for t_idx, rows in staged.items():
            model[t_idx].extend(rows)

    assert pending_transactions(cat) == []
    for t_idx, expected in model.items():
        tbl = cat.table("db", f"t{t_idx}")
        got = (
            sorted(r["id"] for r in tbl.read(spark).collect())
            if tbl.exists() and tbl.current_snapshot() is not None
            else []
        )
        assert got == sorted(expected), f"table t{t_idx}"


@settings(max_examples=_N_LIGHT, deadline=None)
@given(
    snaps=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=40),   # origin sid
                st.integers(min_value=0, max_value=10**6),  # file #
                st.one_of(
                    st.none(),
                    st.dictionaries(
                        st.sampled_from(["id", "v", "name"]),
                        st.tuples(
                            st.integers(-10**9, 10**9),
                            st.integers(-10**9, 10**9),
                        ).map(list),
                        max_size=3,
                    ),
                ),
            ),
            max_size=12,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_manifest_chunk_roundtrip(tmp_path_factory, snaps):
    """The chunked metadata store must round-trip ARBITRARY snapshot
    file lists exactly — order, stats, every field — through
    _save_meta → _load_meta, including re-saves that trust refs."""
    import json as _json
    import os as _os

    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import (
        SnapCatalog,
    )

    root = tmp_path_factory.mktemp("chunkprop")
    cat = SnapCatalog(str(root / "wh"))
    tbl = cat.table("db", "t")
    _os.makedirs(_os.path.dirname(tbl._meta_path), exist_ok=True)
    meta = {"current_id": len(snaps), "snapshots": []}
    for i, files in enumerate(snaps, start=1):
        meta["snapshots"].append(
            {
                "snapshot_id": i,
                "parent_id": i - 1 or None,
                "committed_at": f"2024-06-{i:02d}T00:00:00+00:00",
                "operation": "append",
                "summary": {},
                "schema_ddl": "id BIGINT",
                "partition_spec": [],
                "files": [
                    {
                        "path": f"data/s{sid:06d}/part-{n:07d}.parquet",
                        "records": n,
                        "bytes": n * 10,
                        "stats": stats,
                    }
                    for sid, n, stats in files
                ],
                "delete_files": [],
            }
        )
    expected = _json.loads(_json.dumps(meta))  # deep copy
    tbl._save_meta(meta)
    got = tbl._load_meta()
    for s_exp, s_got in zip(expected["snapshots"], got["snapshots"]):
        # loaded entries may carry extra default-None DataFile keys; compare
        # on the expected keys exactly, including order of the list
        assert len(s_got["files"]) == len(s_exp["files"])
        for fe, fg in zip(s_exp["files"], s_got["files"]):
            for k, v in fe.items():
                assert fg.get(k) == v, (k, fe, fg)
    # second save (refs trusted) then load must be identical again
    tbl._save_meta(got)
    got2 = tbl._load_meta()
    for s1, s2 in zip(got["snapshots"], got2["snapshots"]):
        assert s1["files"] == s2["files"]


# literal text including quotes, backslashes, SQL keywords and table
# references that must survive the front-end rewrite untouched
_literal_text = st.lists(
    st.sampled_from(
        list("abc'\"\\,() \n-*/") + ["FROM db.t", "JOIN", "BETWEEN", "--", "/*"]
    ),
    min_size=0,
    max_size=20,
).map("".join)


@given(lit=_literal_text, dq=st.booleans())
@settings(max_examples=_N_LIGHT, deadline=None)
def test_sqlfront_literal_roundtrip_fuzz(spark, tmp_path_factory, lit, dq):
    """ANY string literal — quotes, backslashes, comment openers,
    table references inside — must round-trip bit-exact through the
    front-end's mask/rewrite/restore cycle, in both quote forms
    (r10, the double-quote masking fix generalized)."""
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
    from apache_iceberg_tables_migration_tool_spark.sources.sqlfront import snapcat_sql

    global _FUZZ_CAT
    try:
        cat = _FUZZ_CAT
    except NameError:
        root = tmp_path_factory.mktemp("sqlfuzz")
        cat = SnapCatalog(str(root / "wh"))
        cat.write("db", "t", spark.range(0, 3).select("id"))
        _FUZZ_CAT = cat

    if dq:
        quoted = '"' + lit.replace("\\", "\\\\").replace('"', '\\"') + '"'
    else:
        quoted = "'" + lit.replace("\\", "\\\\").replace("'", "\\'") + "'"
    out = snapcat_sql(
        spark, cat, f"SELECT {quoted} AS x, count(*) AS n FROM db.t"
    ).collect()
    assert out[0]["x"] == lit
    assert out[0]["n"] == 3


# ---------------------------------------------------------------------------
# r11: quoted-identifier DML fuzz — arbitrary (dashed, spaced, dotted)
# db/table names must survive the INSERT→read round trip through the
# backticked statement forms
# ---------------------------------------------------------------------------

#: identifier body: printable ASCII minus the characters the
#: WAREHOUSE LAYOUT cannot host — `/` (path separator), `.` (the
#: db.table separator is structural), `` ` `` (tested via its ``` `` ```
#: doubling separately), and the Hadoop-path killers `:#%\\` and glob
#: metacharacters `*?[]{}` (Spark's path resolution globs read paths).
#: Everything else — spaces, dashes, quotes, commas, parens — must
#: round-trip: quotes inside backticks exercise the backtick-aware
#: masker.
_ident_text = st.text(
    alphabet=st.characters(
        codec="ascii", min_codepoint=32, max_codepoint=126,
        exclude_characters="`/.:#%\\*?[]{}",
    ),
    min_size=1,
    max_size=12,
).filter(lambda s: s.strip() == s)


@given(db=_ident_text, tbl=_ident_text, val=st.integers(0, 10**6))
@settings(max_examples=_N_LIGHT, deadline=None)
def test_sqlfront_quoted_dml_roundtrip_fuzz(spark, tmp_path_factory, db, tbl, val):
    """INSERT INTO `any-db`.`any table` VALUES … then SELECT it back:
    the quoted statement regexes, the catalog layout, and the
    schema-DDL quoting must all agree for arbitrary identifier text
    (r11, the F3 write-half fix generalized)."""
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
    from apache_iceberg_tables_migration_tool_spark.sources.sqlfront import (
        snapcat_execute,
    )

    root = tmp_path_factory.mktemp("dmlfuzz")
    cat = SnapCatalog(str(root / "wh"))
    cat.write(db, tbl, spark.createDataFrame([(0, 0)], "id int, v int"))
    q = lambda s: "`" + s.replace("`", "``") + "`"
    snapcat_execute(
        spark, cat, f"INSERT INTO {q(db)}.{q(tbl)} VALUES (1, {val})"
    )
    out = snapcat_execute(
        spark, cat,
        f"SELECT v FROM {q(db)}.{q(tbl)} WHERE id = 1",
    ).collect()
    assert [r["v"] for r in out] == [val]


# ---------------------------------------------------------------------------
# r11: MERGE clause-matrix fuzz — random target/source tables through
# every supported WHEN-clause combination, expected state computed by
# an independent pure-Python merge
# ---------------------------------------------------------------------------

_merge_rows = st.dictionaries(
    keys=st.integers(0, 9), values=st.integers(-100, 100), min_size=1, max_size=6
)
#: source as a LIST of (k, v) rows — duplicate keys are REACHABLE, so
#: the cardinality guard's both arms get fuzzed (matched duplicates
#: raise, unmatched duplicates each insert); the r11 verdict found the
#: old dict-keyed strategy made duplicates unreachable by construction
_merge_src_rows = st.lists(
    st.tuples(st.integers(0, 9), st.integers(-100, 100)), min_size=1, max_size=8
)
#: (matched, not_matched, by_source) — every supported combination;
#: "set" = explicit assignment list (v = s.v + 1 / v = -1 for by_source)
_merge_combos = st.sampled_from([
    ("star", "star", None), ("star", None, None), (None, "star", None),
    ("set", None, None), ("set", "star", None), ("star", "cols", None),
    ("set", "cols", None), (None, "cols", None),
    ("delete", None, None),
    # MATCHED DELETE combined with INSERT / BY SOURCE (routed, one commit)
    ("delete", "star", None), ("delete", "cols", None),
    ("delete", "star", "delete"), ("delete", None, "set"),
    (None, None, "delete"), ("star", "star", "delete"),
    ("star", None, "delete"), (None, "star", "delete"),
    ("star", None, "set"), (None, None, "set"), ("star", "star", "set"),
])


def _merge_expected_rows(tgt: dict, src: list, combo):
    """Pure-Python reference merge → (raises, sorted (k, v) rows).
    A duplicate source key that MATCHES the target with any WHEN
    MATCHED clause raises (Iceberg's MERGE_CARDINALITY_VIOLATION);
    unmatched duplicates each insert, as upstream."""
    upd, ins, bys = combo
    counts = Counter(k for k, _ in src)
    if upd is not None and any(c > 1 and k in tgt for k, c in counts.items()):
        return True, []
    src_map = dict(src)  # matched keys are unique here (else raised)
    out = []
    for k, v in tgt.items():
        if k in counts:  # matched
            if upd == "star":
                out.append((k, src_map[k]))
            elif upd == "set":
                out.append((k, src_map[k] + 1))
            elif upd == "delete":
                pass  # dropped
            else:
                out.append((k, v))  # no MATCHED clause: row unchanged
        else:  # not matched by source
            if bys == "delete":
                pass
            elif bys == "set":
                out.append((k, -1))
            else:
                out.append((k, v))
    if ins is not None:
        for k, v in src:  # per-ROW: unmatched duplicates both insert
            if k not in tgt:
                out.append((k, v))
    return False, sorted(out)


@given(
    tgt=_merge_rows, src=_merge_src_rows, combo=_merge_combos,
    mor=st.booleans(), qual=st.booleans(), on_branch=st.booleans(),
)
@settings(max_examples=_N_LIGHT, deadline=None)
def test_merge_clause_matrix_fuzz(
    spark, tmp_path_factory, tgt, src, combo, mor, qual, on_branch
):
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
    from apache_iceberg_tables_migration_tool_spark.sources.sqlfront import snapcat_dml

    upd, ins, bys = combo
    root = tmp_path_factory.mktemp("mergefuzz")
    cat = SnapCatalog(str(root / "wh"))
    cat.write(
        "db", "t",
        spark.createDataFrame(sorted(tgt.items()), "k int, v int"),
    )
    if mor:  # both row-level strategies must agree with the reference
        cat.set_properties("db", "t", {"write.merge.mode": "merge-on-read"})
    if on_branch:  # branch arm: identical semantics on the branch line
        cat.create_branch("db", "t", "fz")
    cat.write(
        "db", "s",
        spark.createDataFrame(sorted(src), "k int, v int"),
    )
    clauses = []
    if upd == "star":
        clauses.append("WHEN MATCHED THEN UPDATE SET *")
    elif upd == "set":
        clauses.append("WHEN MATCHED THEN UPDATE SET v = s.v + 1")
    elif upd == "delete":
        clauses.append("WHEN MATCHED THEN DELETE")
    if ins == "star":
        clauses.append("WHEN NOT MATCHED THEN INSERT *")
    elif ins == "cols":
        clauses.append("WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)")
    if bys == "delete":
        clauses.append("WHEN NOT MATCHED BY SOURCE THEN DELETE")
    elif bys == "set":
        clauses.append("WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = -1")
    # qual arm: the fully-qualified three-part ON spelling Spark accepts
    on = "db.t.k = s.k" if qual else "t.k = s.k"
    target = "db.t.branch_fz" if on_branch else "db.t"
    stmt = f"MERGE INTO {target} USING db.s AS s ON {on} " + " ".join(clauses)

    def state(**kw):
        return sorted(
            (r["k"], r["v"]) for r in cat.table("db", "t").read(spark, **kw).collect()
        )

    raises, expected = _merge_expected_rows(tgt, src, combo)
    if raises:
        with pytest.raises(ValueError, match="cardinality violation"):
            snapcat_dml(spark, cat, stmt)
        assert state() == sorted(tgt.items())  # guard fired BEFORE any commit
        if on_branch:
            assert state(ref="fz") == sorted(tgt.items())
        return
    snapcat_dml(spark, cat, stmt)
    if on_branch:
        # the branch carries the merge result; main is untouched
        assert state(ref="fz") == expected
        assert state() == sorted(tgt.items())
    else:
        assert state() == expected


#: CDC changelog as a LIST of (k, v, op) rows — duplicate keys are
#: reachable (the malformed batch a CDC pipeline eventually feeds it);
#: op: D = delete, U = update/insert, N = no-op marker
_cdc_src = st.lists(
    st.tuples(
        st.integers(0, 9), st.integers(-100, 100), st.sampled_from("DUN")
    ),
    min_size=1, max_size=6,
)


@given(
    tgt=_merge_rows, src=_cdc_src, mor=st.booleans(),
    prune=st.booleans(), qual=st.booleans(),
)
@settings(max_examples=_N_LIGHT, deadline=None)
def test_merge_cdc_apply_fuzz(spark, tmp_path_factory, tgt, src, mor, prune, qual):
    """The conditional CDC-apply MERGE (ordered WHEN … AND clauses,
    mixed delete+update+insert in one commit) against a pure-Python
    changelog application, under both row-level strategies. The
    ``prune`` arm appends WHEN NOT MATCHED BY SOURCE THEN DELETE —
    the full CDC-plus-prune statement, still ONE commit. Duplicate
    changelog keys that match the target raise the cardinality guard
    and leave the table untouched."""
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
    from apache_iceberg_tables_migration_tool_spark.sources.sqlfront import snapcat_dml

    root = tmp_path_factory.mktemp("cdcfuzz")
    cat = SnapCatalog(str(root / "wh"))
    cat.write(
        "db", "t", spark.createDataFrame(sorted(tgt.items()), "k int, v int")
    )
    if mor:
        cat.set_properties("db", "t", {"write.merge.mode": "merge-on-read"})
    cat.write(
        "db", "chg",
        spark.createDataFrame(sorted(src), "k int, v int, op string"),
    )
    before = len(cat.table("db", "t").snapshots())
    stmt = (
        f"MERGE INTO db.t USING db.chg AS s ON {'db.t.k' if qual else 't.k'} = s.k "
        "WHEN MATCHED AND s.op = 'D' THEN DELETE "
        "WHEN MATCHED AND s.op = 'U' THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED AND s.op = 'U' THEN INSERT (k, v) VALUES (s.k, s.v)"
    )
    if prune:
        stmt += " WHEN NOT MATCHED BY SOURCE THEN DELETE"
    counts = Counter(k for k, _v, _op in src)
    if any(c > 1 and k in tgt for k, c in counts.items()):
        with pytest.raises(ValueError, match="cardinality violation"):
            snapcat_dml(spark, cat, stmt)
        got = sorted(
            (r["k"], r["v"]) for r in cat.table("db", "t").read(spark).collect()
        )
        assert got == sorted(tgt.items())
        assert len(cat.table("db", "t").snapshots()) == before  # NO commit
        return
    snapcat_dml(spark, cat, stmt)
    src_map = {k: (v, op) for k, v, op in src}  # matched keys unique here
    expected = []
    for k, v in tgt.items():
        if k in counts:
            v2, op = src_map[k]
            if op == "D":
                continue
            expected.append((k, v2 if op == "U" else v))
        elif not prune:
            expected.append((k, v))
    for k, v, op in src:  # per-ROW: unmatched duplicate 'U's both insert
        if k not in tgt and op == "U":
            expected.append((k, v))
    got = sorted(
        (r["k"], r["v"]) for r in cat.table("db", "t").read(spark).collect()
    )
    assert got == sorted(expected)
    assert len(cat.table("db", "t").snapshots()) == before + 1  # ONE commit


# ---------------------------------------------------------------------------
# r13: subquery-predicate DML fuzz — DELETE/UPDATE WHERE with IN /
# NOT IN (ANSI null semantics) / correlated EXISTS / scalar subquery,
# both row-level modes, vs a pure-Python reference
# ---------------------------------------------------------------------------

_dml_tbl = st.dictionaries(
    keys=st.integers(0, 9), values=st.integers(-50, 50), min_size=1, max_size=8
)
_dml_tomb = st.lists(
    st.one_of(st.none(), st.integers(0, 9)), min_size=0, max_size=5
)


def _subq_matched(k: int, tomb: list, shape: str) -> bool:
    ids = [x for x in tomb if x is not None]
    has_null = any(x is None for x in tomb)
    if shape == "in":
        return k in ids
    if shape == "not_in":
        # ANSI: false if k ∈ S; NULL (no match) if NULL ∈ S; else true
        return k not in ids and not has_null
    if shape == "exists":  # correlated equality — NULLs never equal
        return k in ids
    # scalar: id > (SELECT max(id) FROM tomb); max of ∅/all-NULL = NULL
    return bool(ids) and k > max(ids)


@given(
    tbl=_dml_tbl, tomb=_dml_tomb,
    shape=st.sampled_from(["in", "not_in", "exists", "scalar"]),
    op=st.sampled_from(["delete", "update"]),
    mor=st.booleans(), on_branch=st.booleans(),
)
@settings(max_examples=_N_LIGHT, deadline=None)
def test_dml_subquery_predicate_fuzz(
    spark, tmp_path_factory, tbl, tomb, shape, op, mor, on_branch
):
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
    from apache_iceberg_tables_migration_tool_spark.sources.sqlfront import (
        snapcat_execute,
    )

    root = tmp_path_factory.mktemp("dmlsubq")
    cat = SnapCatalog(str(root / "wh"))
    cat.write("db", "t", spark.createDataFrame(
        sorted(tbl.items()), "id int, v int"))
    cat.write("db", "tomb", spark.createDataFrame(
        [(x,) for x in tomb] or spark.sparkContext.emptyRDD(), "id int"))
    if mor:
        cat.set_properties("db", "t", {
            "write.delete.mode": "merge-on-read",
            "write.update.mode": "merge-on-read",
        })
    if on_branch:  # branch arm: same semantics, branch-isolated commit
        cat.create_branch("db", "t", "fz")
    cond = {
        "in": "id IN (SELECT id FROM db.tomb)",
        "not_in": "id NOT IN (SELECT id FROM db.tomb)",
        "exists": "EXISTS (SELECT 1 FROM db.tomb WHERE db.tomb.id = t.id)",
        "scalar": "id > (SELECT max(id) FROM db.tomb)",
    }[shape]
    target = "db.t.branch_fz" if on_branch else "db.t"
    stmt = (
        f"DELETE FROM {target} WHERE {cond}"
        if op == "delete"
        else f"UPDATE {target} SET v = -7 WHERE {cond}"
    )
    snapcat_execute(spark, cat, stmt)
    if op == "delete":
        expected = {k: v for k, v in tbl.items()
                    if not _subq_matched(k, tomb, shape)}
    else:
        expected = {k: (-7 if _subq_matched(k, tomb, shape) else v)
                    for k, v in tbl.items()}
    kw = {"ref": "fz"} if on_branch else {}
    got = {r["id"]: r["v"] for r in cat.table("db", "t").read(spark, **kw).collect()}
    assert got == expected
    if on_branch:  # main untouched by the branch commit
        main = {r["id"]: r["v"] for r in cat.table("db", "t").read(spark).collect()}
        assert main == dict(tbl)
    head = (
        cat.table("db", "t").resolve_snapshot(ref="fz")
        if on_branch
        else cat.table("db", "t").current_snapshot()
    )
    if mor:  # merge-on-read: the seed data file is carried by reference
        assert any(f.path.startswith("data/s000001") for f in head.files)
        assert all(d.kind == "position" for d in head.delete_files)
