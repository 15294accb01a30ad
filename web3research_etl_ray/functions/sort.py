"""Distributed global sort — sampled range partitioning (TeraSort shape).

The reference engine delegates ORDER BY to ClickHouse's insert-time
sort (SURVEY §2.6; reference src/ch_eth/sync.rs table DDLs carry
ORDER BY clauses); a standalone engine must own the sort.  Ray Data's
built-in ``Dataset.sort`` is a full-table sort with its own all-to-all;
this module implements the classic alternative whose exchange volume is
exactly one row trip and whose driver state is O(R):

1. one cheap streaming pass draws a deterministic stride sample of the
   key per block (driver holds ~``sample_per_block`` × blocks values);
2. the driver picks R-1 boundary values at even sample quantiles —
   sampled (not equal-width) cuts keep ranges balanced under ANY key
   distribution, not just uniform ones;
3. rows exchange ONCE into their range; each range sorts locally
   (numpy lexsort) and emits exact global ranks from the driver's
   exclusive prefix of per-range counts.

Scale notes: ranges are ~2×CPU so a straggler cannot serialize the
stage; ties on the key all land in one range by construction
(searchsorted side="right"), so a key where one value dominates needs
a compound key or a finer tiebreak-aware split — documented, not
hidden.  NULL keys sort last (both directions), matching DuckDB's
default NULLS LAST.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .window import default_num_buckets


def _key_as_np(col: pa.ChunkedArray, descending: bool) -> np.ndarray:
    """Key column as a float64/int64 numpy vector oriented so ASCENDING
    numpy order == the requested sort order; NULLs map to +inf (last)."""
    if col.null_count > 0:
        v = col.cast(pa.float64()).to_numpy(zero_copy_only=False)
        if descending:
            v = -v  # NaN stays NaN under negation
        return np.where(np.isnan(v), np.inf, v)
    v = col.to_numpy(zero_copy_only=False)
    if descending:
        # integer keys negate in int64 (a float cast would scramble
        # order above 2^53); only INT64_MIN wraps, which no real key hits
        v = -v
    return v


def range_partitioned_sort(
    ds: ray.data.Dataset,
    key_col: str,
    *,
    descending: bool = False,
    tiebreak_col: str | None = None,
    num_ranges: int | None = None,
    sample_per_block: int = 96,
    rank_col: str = "sort_rank",
) -> ray.data.Dataset:
    """Totally order ``ds`` by (``key_col`` [DESC], ``tiebreak_col``)
    and append the exact 1-based global rank as ``rank_col``.

    The output Dataset's blocks are the ranges in arbitrary block
    order; the rank column IS the total order (consumers that need
    physical order read ranges by their rank span, e.g. Parquet
    zone-map pruning on ``rank_col``)."""
    if num_ranges is None:
        num_ranges = default_num_buckets()

    # -- pass 0: stride sample of the key (deterministic, tiny) -------
    def sample(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({"k": pa.array([], pa.float64())})
        step = max(1, n // sample_per_block)
        idx = np.arange(0, n, step, dtype=np.int64)[:sample_per_block]
        k = _key_as_np(t.column(key_col).combine_chunks(), descending)[idx]
        return pa.table({"k": pa.array(k, pa.float64())})

    rows = ds.map_batches(
        sample, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    if not rows:
        return ds.map_batches(
            lambda t: t.append_column(rank_col, pa.array([], pa.int64())),
            batch_format="pyarrow",
        )
    s = np.sort(np.array([r["k"] for r in rows], dtype=np.float64))
    # R-1 cuts at even sample quantiles; duplicates collapse (ties
    # share a range so rank math never splits a tie across workers)
    cut_idx = (np.arange(1, num_ranges) * len(s)) // num_ranges
    bounds = np.unique(s[cut_idx])

    # -- pass 1: tag ranges, count them ------------------------------
    def tag(t: pa.Table) -> pa.Table:
        k = _key_as_np(t.column(key_col).combine_chunks(), descending)
        r = np.searchsorted(bounds, k, side="right")
        return t.append_column("__r", pa.array(r, pa.int64()))

    tagged = ds.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    counts: dict[int, int] = {}
    for row in (
        tagged.map_batches(
            lambda t: t.select(["__r"])
            .group_by("__r")
            .aggregate([("__r", "count")])
            .rename_columns(["__r", "n"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("__r")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .take_all()
    ):
        counts[int(row["__r"])] = int(row["n"])
    n_ranges_eff = len(bounds) + 1
    offsets = np.zeros(n_ranges_eff, dtype=np.int64)
    acc = 0
    for r in range(n_ranges_eff):
        offsets[r] = acc
        acc += counts.get(r, 0)
    off_ref = ray.put(offsets)

    # -- pass 2: local sort per range + exact global ranks ------------
    def local_sort(g: pa.Table) -> pa.Table:
        r = int(g.column("__r")[0].as_py())
        k = _key_as_np(g.column(key_col).combine_chunks(), descending)
        if tiebreak_col is not None:
            tb = g.column(tiebreak_col).to_numpy(zero_copy_only=False)
            order = np.lexsort((tb, k))
        else:
            order = np.argsort(k, kind="stable")
        out = g.drop_columns(["__r"]).take(pa.array(order, pa.int64()))
        base = int(ray.get(off_ref)[r])
        rank = base + 1 + np.arange(len(order), dtype=np.int64)
        return out.append_column(rank_col, pa.array(rank, pa.int64()))

    return tagged.groupby("__r").map_groups(
        local_sort, batch_format="pyarrow"
    )


def global_ntile(
    ds: ray.data.Dataset,
    key_col: str,
    k: int,
    *,
    tiebreak_col: str | None = None,
    bin_col: str = "bin",
    num_ranges: int | None = None,
) -> ray.data.Dataset:
    """SQL ``ntile(k) OVER (ORDER BY key [, tiebreak])`` over the whole
    dataset — exact equi-depth binning off the range sort's global
    ranks (first ``n % k`` bins one row larger, per the SQL contract)."""
    ranked = range_partitioned_sort(
        ds,
        key_col,
        tiebreak_col=tiebreak_col,
        num_ranges=num_ranges,
        rank_col="__rank",
    )
    total = ds.count()
    ceil = (total + k - 1) // k
    floor = max(1, total // k)
    rem = total % k
    cut = rem * ceil

    def to_bin(t: pa.Table) -> pa.Table:
        r0 = t.column("__rank").to_numpy(zero_copy_only=False) - 1
        big = r0 < cut
        b = np.where(big, r0 // max(ceil, 1), rem + (r0 - cut) // floor) + 1
        return t.drop_columns(["__rank"]).append_column(
            bin_col, pa.array(b.astype(np.int64), pa.int64())
        )

    return ranked.map_batches(
        to_bin, batch_format="pyarrow", zero_copy_batch=True
    )
