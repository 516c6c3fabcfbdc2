"""Model-based property test of the snapshot catalog: a random
sequence of table operations (append / MOR equality delete / MOR
position delete / COW update / COW delete / MOR merge / compact)
executed against BOTH the real `SnapCatalog` and a pure-Python
reference model of a keyed table must agree on the full table state
after every operation — the strongest guard for feature-INTERACTION
bugs (the class the round-4 review found: NULL-predicate COW deletes,
alters dropping MOR obligations) that single-feature tests miss.

The model: dict id -> v with SQL semantics; ops are generated keyed
on a small id universe so collisions, re-appends after deletes, and
no-op matches all occur frequently.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

_IDS = st.integers(0, 9)

_op = st.one_of(
    st.tuples(st.just("append"), st.lists(_IDS, min_size=1, max_size=4)),
    st.tuples(st.just("mor_delete_keys"), st.lists(_IDS, min_size=1, max_size=3)),
    st.tuples(st.just("mor_delete_where"), _IDS),  # delete v >= id*10
    st.tuples(st.just("cow_delete"), _IDS),
    st.tuples(st.just("cow_update"), _IDS),  # v += 1 where id == x
    st.tuples(st.just("mor_merge"), st.lists(_IDS, min_size=1, max_size=3)),
    st.tuples(st.just("compact"), st.just(None)),
)


def _apply_model(model: list[tuple[int, int]], op, seq: int):
    """model is a multiset of (id, v) rows — appends may duplicate ids."""
    kind, arg = op
    if kind == "append":
        model.extend((i, i * 10 + seq) for i in arg)
    elif kind == "mor_delete_keys":
        keys = set(arg)
        model[:] = [(i, v) for i, v in model if i not in keys]
    elif kind == "mor_delete_where":
        cut = arg * 10
        model[:] = [(i, v) for i, v in model if not v >= cut]
    elif kind == "cow_delete":
        model[:] = [(i, v) for i, v in model if i != arg]
    elif kind == "cow_update":
        model[:] = [(i, v + 1 if i == arg else v) for i, v in model]
    elif kind == "mor_merge":
        keys = set(arg)
        model[:] = [(i, v) for i, v in model if i not in keys]
        model.extend((i, i * 10 + seq) for i in keys)  # merge rows dedupe by key
    # compact: no logical change


@given(ops=st.lists(_op, min_size=1, max_size=7))
@settings(max_examples=6, deadline=None)
def test_catalog_matches_reference_model(spark, tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("model_wh"))
    cat = SnapCatalog(root)
    model: list[tuple[int, int]] = []
    cat.write("db", "t", spark.createDataFrame(
        [(i, i * 10) for i in range(5)], "id long, v long"))
    model.extend((i, i * 10) for i in range(5))
    for seq, op in enumerate(ops, start=1):
        kind, arg = op
        if kind == "append":
            cat.write("db", "t", spark.createDataFrame(
                [(i, i * 10 + seq) for i in arg], "id long, v long"))
        elif kind == "mor_delete_keys":
            cat.delete_keys("db", "t", spark.createDataFrame(
                [(i,) for i in set(arg)], "id long"), ["id"])
        elif kind == "mor_delete_where":
            cat.delete_where("db", "t", f"v >= {arg * 10}", mode="merge-on-read")
        elif kind == "cow_delete":
            cat.delete_where("db", "t", f"id = {arg}")
        elif kind == "cow_update":
            cat.update_where("db", "t", f"id = {arg}", {"v": "v + 1"})
        elif kind == "mor_merge":
            cat.upsert_mor("db", "t", spark.createDataFrame(
                sorted({(i, i * 10 + seq) for i in arg}), "id long, v long"), ["id"])
        elif kind == "compact":
            cat.compact("db", "t", spark, target_partitions=1)
        _apply_model(model, op, seq)
        got = sorted(
            (r["id"], r["v"])
            for r in cat.table("db", "t").read(spark).collect()
        )
        assert got == sorted(model), f"divergence after {kind}({arg}) at step {seq}"
    # lineage invariant at the end: ids unique over however many rows
    rows = cat.table("db", "t").read(spark, with_row_ids=True).collect()
    ids = [r["_row_id"] for r in rows]
    assert None not in ids and len(set(ids)) == len(ids)
