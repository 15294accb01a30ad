"""Distributed global sort (functions/sort.py): sampled range
partitioning with exact global ranks — the engine-owned ORDER BY the
reference delegates to ClickHouse insert-time sort."""

import numpy as np
import pyarrow as pa
import ray

from web3research_etl_ray.functions.sort import (
    global_ntile,
    range_partitioned_sort,
)


def _ranks(ds, key="k"):
    rows = ds.take_all()
    rows.sort(key=lambda r: r["sort_rank"])
    return rows


def test_sort_matches_numpy_total_order():
    rng = np.random.default_rng(7)
    v = rng.normal(size=5000)
    ids = np.arange(5000, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"id": ids, "k": v})
    ).repartition(13)
    out = _ranks(range_partitioned_sort(ds, "k", tiebreak_col="id"))
    assert [r["sort_rank"] for r in out] == list(range(1, 5001))
    order = np.lexsort((ids, v))
    assert [r["id"] for r in out] == list(ids[order])


def test_sort_descending_int_keys_with_ties():
    # heavy ties + int64 keys: ties must share a range, tiebreak decides
    v = np.array([5, 3, 5, 1, 3, 5, 1, 9] * 100, dtype=np.int64)
    ids = np.arange(len(v), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"id": ids, "k": v})).repartition(7)
    out = _ranks(
        range_partitioned_sort(ds, "k", descending=True, tiebreak_col="id")
    )
    order = np.lexsort((ids, -v))
    assert [r["id"] for r in out] == list(ids[order])


def test_sort_nulls_last_both_directions():
    t = pa.table(
        {
            "id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "k": pa.array([2.0, None, 1.0, None, 3.0]),
        }
    )
    ds = ray.data.from_arrow(t)
    asc = _ranks(range_partitioned_sort(ds, "k", tiebreak_col="id"))
    assert [r["id"] for r in asc] == [2, 0, 4, 1, 3]
    desc = _ranks(
        range_partitioned_sort(ds, "k", descending=True, tiebreak_col="id")
    )
    assert [r["id"] for r in desc] == [4, 0, 2, 1, 3]


def test_sort_all_equal_single_range_still_exact():
    v = np.zeros(500)
    ids = np.arange(500, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"id": ids, "k": v})).repartition(5)
    out = _ranks(range_partitioned_sort(ds, "k", tiebreak_col="id"))
    assert [r["id"] for r in out] == list(range(500))


def test_global_ntile_matches_sql_contract():
    # n=103, k=5 → first 103%5=3 bins get ceil(103/5)=21, rest 20
    rng = np.random.default_rng(3)
    v = rng.uniform(size=103)
    ids = np.arange(103, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"id": ids, "k": v})).repartition(4)
    rows = global_ntile(ds, "k", 5, tiebreak_col="id").take_all()
    order = np.lexsort((ids, v))
    expect = {}
    sizes = [21, 21, 21, 20, 20]
    pos = 0
    for b, s in enumerate(sizes, start=1):
        for i in ids[order][pos : pos + s]:
            expect[int(i)] = b
        pos += s
    got = {int(r["id"]): int(r["bin"]) for r in rows}
    assert got == expect
