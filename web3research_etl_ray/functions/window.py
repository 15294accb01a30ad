"""Keyed window functions — lag/lead, running aggregates, ranking.

The reference has no window functions (its ClickHouse queries are
plain aggregates), but any SQL user of the engine expects the family;
they also exercise the one partitioning assumption every streaming
window shares: ALL rows of one key must be co-located.

Scale shape
-----------
One hash-bucket exchange (``groupby(__b)``) co-locates keys, then each
bucket is processed in ONE vectorized pass over all keys at once:
lexsort by (key, order...), a key-change mask marks segment starts,
and every window primitive (shift-lag, cumulative sums rebased per
segment, row numbers, dense ranks) is numpy arithmetic over the whole
bucket — no per-key Python loop, no per-key group_by.  At 10^10 rows
the exchange moves each row once and per-bucket memory is
rows/num_buckets; skewed keys cost only their own segment length.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

import ray.data


def _bucketize(key_col: str, num_buckets: int):
    def add_bucket(t: pa.Table) -> pa.Table:
        col = t.column(key_col)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            from .hashing import key_hash64

            h = key_hash64(col)
        else:
            k = col.to_numpy(zero_copy_only=False)
            h = k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return t.append_column(
            "__b", pa.array((h % np.uint64(num_buckets)).astype(np.int64), pa.int64())
        )

    return add_bucket


def default_num_buckets() -> int:
    """Bucket count sized to the cluster: ~2 buckets per CPU so every
    core has work and a straggler bucket can't serialize the stage,
    floored at 16 for single-digit-core test sessions.  Results are
    bucket-count-independent (hash partitioning only)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(16, 2 * cpus)


def keyed_window(
    ds: ray.data.Dataset,
    key_col: str,
    fn: Callable[[pa.Table], pa.Table],
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Hash-co-locate ``key_col`` then apply ``fn`` once per bucket.

    ``fn`` sees every row of every key assigned to the bucket (the
    windowing contract) and must itself be vectorized.
    ``num_buckets=None`` sizes the exchange to the cluster
    (``default_num_buckets``).
    """
    if num_buckets is None:
        num_buckets = default_num_buckets()

    def per_bucket(g: pa.Table) -> pa.Table:
        return fn(g.drop_columns(["__b"]))

    return (
        ds.map_batches(
            _bucketize(key_col, num_buckets),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def segment_starts(keys: np.ndarray) -> np.ndarray:
    """Boolean mask: True where a new key segment begins (input sorted
    key-major)."""
    n = len(keys)
    mask = np.ones(n, dtype=bool)
    if n:
        mask[1:] = keys[1:] != keys[:-1]
    return mask


def lag_one(values: np.ndarray, starts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-segment shift-by-one: returns (lagged values, valid mask)."""
    lagged = np.empty_like(values)
    lagged[1:] = values[:-1]
    valid = ~starts
    return lagged, valid


def lead_one(values: np.ndarray, starts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-segment shift-by-minus-one: returns (led values, valid mask);
    invalid at each segment's last row."""
    led = np.empty_like(values)
    led[:-1] = values[1:]
    valid = np.empty(len(values), dtype=bool)
    valid[:-1] = ~starts[1:]
    if len(valid):
        valid[-1] = False
    return led, valid


def moving_sum(values: np.ndarray, starts: np.ndarray, k: int) -> np.ndarray:
    """Per-segment moving sum over the trailing window of ``k`` rows
    (SQL ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW), one pass:
    within-segment cumsum minus the same cumsum shifted by ``k`` —
    valid because whenever a row's segment row-number exceeds ``k``,
    the row ``k`` back is in the same segment."""
    s = running_sum(values, starts)
    rn = row_numbers(starts)
    out = s.copy()
    if len(s) > k:
        take_back = rn > k
        out[k:] = np.where(take_back[k:], s[k:] - s[:-k], s[k:])
    return out


def running_sum(values: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Inclusive per-segment cumulative sum, one pass over the bucket:
    global cumsum rebased by the running total just before each
    segment start."""
    c = np.cumsum(values)
    start_idx = np.flatnonzero(starts)
    base_at_start = np.where(start_idx > 0, c[start_idx - 1], 0)
    seg_id = np.cumsum(starts) - 1
    return c - base_at_start[seg_id]


def row_numbers(starts: np.ndarray) -> np.ndarray:
    """1-based per-segment row numbers (input sorted key-major)."""
    n = len(starts)
    idx = np.arange(n, dtype=np.int64)
    start_idx = np.flatnonzero(starts)
    seg_id = np.cumsum(starts) - 1
    return idx - start_idx[seg_id] + 1


def dense_ranks(change: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """1-based per-segment dense ranks. ``change`` marks rows whose
    rank-order value differs from the previous row (within-segment);
    rows at segment starts always begin at rank 1."""
    bump = change | starts
    c = np.cumsum(bump)
    start_idx = np.flatnonzero(starts)
    seg_id = np.cumsum(starts) - 1
    return c - c[start_idx][seg_id] + 1


def segment_sizes(starts: np.ndarray) -> np.ndarray:
    """Per-row segment length (input sorted key-major)."""
    n = len(starts)
    start_idx = np.flatnonzero(starts)
    counts = np.diff(np.append(start_idx, n))
    return np.repeat(counts, counts)


def first_last(values: np.ndarray, starts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(first, last) value of each row's segment, broadcast per row."""
    n = len(starts)
    start_idx = np.flatnonzero(starts)
    counts = np.diff(np.append(start_idx, n))
    first = np.repeat(values[start_idx], counts)
    last = np.repeat(values[start_idx + counts - 1], counts)
    return first, last


def min_ranks(change: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """1-based SQL rank() (ties share the tie-group's FIRST row number,
    gaps after): ``change`` marks rows whose order-value differs from
    the previous row within the segment."""
    rn = row_numbers(starts)
    bump = change | starts
    idx = np.arange(len(rn), dtype=np.int64)
    last_bump = np.maximum.accumulate(np.where(bump, idx, -1))
    return rn[last_bump]


def ntiles(k: int, starts: np.ndarray) -> np.ndarray:
    """SQL ntile(k): rows of each segment split into k buckets, the
    first ``size % k`` buckets one row larger."""
    rn = row_numbers(starts)
    size = segment_sizes(starts)
    r = rn - 1
    ceil = (size + k - 1) // k
    floor = size // k
    rem = size % k
    cut = rem * ceil
    big = r < cut
    return np.where(
        big,
        r // np.maximum(ceil, 1),
        rem + (r - cut) // np.maximum(floor, 1),
    ) + 1


def range_frame_bounds(
    ts: np.ndarray, starts: np.ndarray, window: int
) -> tuple[np.ndarray, np.ndarray]:
    """SQL RANGE-frame bounds (``RANGE BETWEEN window PRECEDING AND
    CURRENT ROW``) for key-major (key, ts)-sorted int64 timestamps:
    per row, the [lo, hi) row-index slice of the same segment whose ts
    lies in the CLOSED interval [ts_i - window, ts_i].  ``hi`` lands
    after the last PEER (equal ts), matching SQL's frame-ends-at-last-
    peer rule, so equal-ts rows see each other regardless of tie order.

    Vectorized across every segment of the bucket at once: each
    segment's ts is rebased to its own start and lifted onto one
    monotone int64 axis with inter-segment gaps > window, so TWO global
    searchsorteds answer every row's bounds and no probe crosses a
    segment boundary.  When the lifted axis would overflow int64 (many
    segments x long spans) the lift restarts per overflow chunk — the
    loop count is overflow-driven (~totalspan / 2^62), never per-key."""
    n = len(ts)
    lo = np.empty(n, np.int64)
    hi = np.empty(n, np.int64)
    if n == 0:
        return lo, hi
    window = np.int64(window)
    start_idx = np.flatnonzero(starts)
    counts = np.diff(np.append(start_idx, n))
    rel = ts - np.repeat(ts[start_idx], counts)
    seg_last_rel = rel[np.append(start_idx[1:], n) - 1]
    stride = seg_last_rel + window + np.int64(2)
    cumf = np.cumsum(stride.astype(np.float64))
    limit = float(np.int64(1) << np.int64(62))
    s0 = 0
    while s0 < len(start_idx):
        base_off = cumf[s0] - float(stride[s0])
        s1 = int(np.searchsorted(cumf, base_off + limit, side="left"))
        s1 = max(s1, s0 + 1)
        r0 = start_idx[s0]
        r1 = start_idx[s1] if s1 < len(start_idx) else n
        st = stride[s0:s1]
        base = np.concatenate(
            ([np.int64(0)], np.cumsum(st[:-1]))
        ).astype(np.int64)
        axis = rel[r0:r1] + np.repeat(base, counts[s0:s1])
        lo[r0:r1] = np.searchsorted(axis, axis - window, side="left") + r0
        hi[r0:r1] = np.searchsorted(axis, axis, side="right") + r0
        s0 = s1
    return lo, hi


def ordered_prefix_sum(
    ds: ray.data.Dataset,
    order_col: str,
    value_col: str,
    *,
    num_ranges: int | None = None,
    out_col: str = "running",
    tiebreak_col: str | None = None,
) -> ray.data.Dataset:
    """Global running sum of ``value_col`` in ``order_col`` order — the
    distributed ordered-scan primitive (SQL ``sum(v) OVER (ORDER BY
    o)``; unique order values assumed).

    Two passes, no global sort:
    1. one streaming pass computes per-RANGE totals (ranges are
       equal-width slices of the order key's [min, max]); the driver
       prefix-sums the tiny R-row table into exclusive offsets;
    2. rows exchange once by range; each range sorts locally and adds
       its offset to the local cumsum.

    Exchange volume = one row trip; driver state = R integers.  Skew
    assumption: the order key is roughly uniform over its span (true
    for dense ids); a skewed key concentrates ranges — raise
    ``num_ranges`` or pre-map the key."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    if num_ranges is None:
        num_ranges = default_num_buckets()
    bounds = ds.aggregate(
        Min(order_col, alias_name="lo"), Max(order_col, alias_name="hi")
    )
    lo, hi = bounds["lo"], bounds["hi"]
    if lo is None:  # empty input: nothing to scan
        return ds
    span = max(1, int(hi) - int(lo) + 1)

    # equal-width ranges via division-first math: multiply-first
    # ((o-lo)*R // span) overflows int64 for hash-sized order keys
    width = (span + num_ranges - 1) // num_ranges

    def add_range(t: pa.Table) -> pa.Table:
        o = t.column(order_col).to_numpy(zero_copy_only=False).astype(np.int64)
        r = (o - int(lo)) // width
        return t.append_column("__r", pa.array(r, pa.int64()))

    ranged = ds.map_batches(
        add_range, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    totals = {
        int(row["__r"]): int(row["total"])
        for row in ranged.map_batches(
            lambda t: t.select(["__r", value_col])
            .group_by("__r")
            .aggregate([(value_col, "sum")])
            .rename_columns(["__r", "total"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("__r")
        .aggregate(Sum("total", alias_name="total"))
        .take_all()
    }
    offsets = np.zeros(num_ranges, dtype=np.int64)
    acc = 0
    for r in range(num_ranges):
        offsets[r] = acc
        acc += totals.get(r, 0)
    import ray as _ray

    off_ref = _ray.put(offsets)

    def local_scan(g: pa.Table) -> pa.Table:
        r = int(g.column("__r")[0].as_py())
        o = g.column(order_col).to_numpy(zero_copy_only=False)
        if tiebreak_col is not None:
            tb = g.column(tiebreak_col).to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, o))
        else:
            order = np.argsort(o, kind="stable")
        v = g.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )[order]
        run = np.cumsum(v) + _ray.get(off_ref)[r]
        g = g.drop_columns(["__r"])
        out = g.take(pa.array(order, pa.int64()))
        return out.append_column(out_col, pa.array(run, pa.int64()))

    return ranged.groupby("__r").map_groups(local_scan, batch_format="pyarrow")
