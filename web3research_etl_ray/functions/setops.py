"""Distributed set operations — INTERSECT / EXCEPT (distinct
semantics), completing SURVEY §2.7 (the reference's set surface is
dedup/distinct only; any SQL user expects the pair).

Scale shape: each side is reduced to per-batch DISTINCT rows with a
presence flag (one row per distinct key per batch), both sides ride
one union into a single ``groupby(cols)`` that max-combines the
flags — the exchange moves O(distinct per batch), never raw rows, and
the decision (in both / only left) is a vectorized filter on the
combined flags.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _flagged_union(
    left: ray.data.Dataset, right: ray.data.Dataset, cols: list[str]
) -> ray.data.Dataset:
    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            g = t.select(cols).group_by(cols).aggregate([])
            n = g.num_rows
            ones = pa.array([1] * n, pa.int64())
            zeros = pa.array([0] * n, pa.int64())
            g = g.append_column("__l", ones if side == "l" else zeros)
            return g.append_column("__r", zeros if side == "l" else ones)

        return fn

    return left.map_batches(
        tag("l"), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(tag("r"), batch_format="pyarrow", zero_copy_batch=True)
    )


def _combine(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    agg = ds.groupby(cols).max(["__l", "__r"])

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [c[len("max(") : -1] if c.startswith("max(") else c
             for c in t.column_names]
        )

    return agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def set_intersect(
    left: ray.data.Dataset, right: ray.data.Dataset, cols: list[str]
) -> ray.data.Dataset:
    """SQL INTERSECT: distinct ``cols`` rows present on BOTH sides."""

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t.column("__l"), 1), pc.equal(t.column("__r"), 1))
        return t.filter(m).select(cols)

    return _combine(_flagged_union(left, right, cols), cols).map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    )


def set_except(
    left: ray.data.Dataset, right: ray.data.Dataset, cols: list[str]
) -> ray.data.Dataset:
    """SQL EXCEPT: distinct ``cols`` rows of left absent from right."""

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t.column("__l"), 1), pc.equal(t.column("__r"), 0))
        return t.filter(m).select(cols)

    return _combine(_flagged_union(left, right, cols), cols).map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    )
