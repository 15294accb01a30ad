"""Last-writer-wins fold kernels (vectorized Arrow, no Python row loops).

The engine analogue of ClickHouse ``ReplacingMergeTree ORDER BY key``
(every reference table, e.g. src/ch_eth/init.rs:169-170): duplicate
keys converge to the max-``commit_seq`` writer.  Two levels:

- ``partial_lww`` runs inside ``map_batches`` BEFORE the shuffle — the
  combiner that collapses each block to one row per key, so the
  all-to-all exchange moves O(distinct keys per block), not O(events).
  This is the scale unlock for hot keys (a key with 10^6 events ships
  at most one row per block) and most of the skew answer.
- ``final_lww`` runs per hash partition after the shuffle (merge stage).

Orphaned events (rollback ranges) never win the fold but are carried as
compact counter rows (op = ``__orphans__``) so per-partition watermarks
and lineage counters stay exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: sentinel op for lineage counter rows riding the same shuffle
ORPHAN_OP = "__orphans__"


def _first_of_key_mask(*key_arrays: pa.Array) -> np.ndarray:
    """Boolean mask of first occurrence per key tuple in a key-sorted
    table: True where ANY key column differs from the previous row.
    Column-wise neighbor compare — no joined-key string allocation."""
    n = len(key_arrays[0])
    if n == 0:
        return np.zeros(0, dtype=bool)
    mask = np.ones(n, dtype=bool)
    diff = np.zeros(n - 1, dtype=bool)
    for a in key_arrays:
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        neq = pc.not_equal(a.slice(1), a.slice(0, n - 1))
        diff |= pc.fill_null(neq, True).to_numpy(zero_copy_only=False)
    mask[1:] = diff
    return mask


def agg_kwargs(spec) -> dict:
    """The fold's accumulator kwargs for a TableSpec — pass as
    ``**agg_kwargs(spec)`` so every fold site stays in sync with the
    spec's aggregate-mode fields."""
    return {
        "sum_cols": getattr(spec, "sum_cols", ()),
        "min_cols": getattr(spec, "min_cols", ()),
        "max_cols": getattr(spec, "max_cols", ()),
    }


def fold_lww(
    t: pa.Table,
    count_col: str | None = "n_events",
    key_cols: tuple[str, ...] = ("repo", "path"),
    order_col: str = "commit_seq",
    sum_cols: tuple[str, ...] = (),
    min_cols: tuple[str, ...] = (),
    max_cols: tuple[str, ...] = (),
) -> pa.Table:
    """Keep the max-``order_col`` row per key tuple; sum ``count_col``
    over the folded rows (skipped if None/absent).  Ties on order
    (duplicate delivery of the same event) keep a single copy — the
    at-least-once tolerance the reference gets from ReplacingMergeTree
    (src/ch_eth/init.rs:435-448 re-inserts every loop and survives only
    because of it).  Generic over key/order so it doubles as the
    engine's keyed-dedup operator for arbitrary tables (TableSpec).

    ``sum_cols`` generalizes the fold from Replacing- to
    SummingMergeTree (the reference's ClickHouse sibling engine): those
    columns ACCUMULATE per key (null = 0) while every other payload
    column still comes from the max-order row.  ``min_cols`` /
    ``max_cols`` extend that to the Aggregating family (running
    min/max per key; null rows are ignored via ±inf sentinels).  All
    three stay associative — partials from any split of the rows
    combine to the same result — which is what lets aggregate tables
    ride the exact combiner → spool → merge-on-write path the LWW
    lake uses.

    The sort and the fold run over ONLY the key/order columns (plus an
    optional subset of row positions); the wide payload (content etc.)
    is gathered ONCE for the winner rows.  Physically sorting or
    filtering the whole table costs seconds per 600 MB block just to
    keep ~10k winners (measured at 50M events) — this path touches
    O(rows) narrow columns + O(winners) wide ones."""
    return _fold_lww_sel(t, None, count_col, key_cols, order_col, sum_cols,
                         min_cols, max_cols)


def _fold_lww_sel(
    t: pa.Table,
    row_sel: np.ndarray | None,
    count_col: str | None = "n_events",
    key_cols: tuple[str, ...] = ("repo", "path"),
    order_col: str = "commit_seq",
    sum_cols: tuple[str, ...] = (),
    min_cols: tuple[str, ...] = (),
    max_cols: tuple[str, ...] = (),
) -> pa.Table:
    """fold_lww restricted to ``row_sel`` positions (None = all rows)
    WITHOUT materializing the subset of wide columns first."""
    if t.num_rows == 0 or (row_sel is not None and len(row_sel) == 0):
        return t.slice(0, 0)
    if row_sel is None:
        keys = [t.column(k) for k in key_cols]
        order_arr = t.column(order_col)
    else:
        sel = pa.array(row_sel, pa.int64())
        keys = [pc.take(t.column(k), sel) for k in key_cols]
        order_arr = pc.take(t.column(order_col), sel)
    key_tbl = pa.table(
        {**{k: a for k, a in zip(key_cols, keys)}, "__o": order_arr}
    )
    idx = pc.sort_indices(
        key_tbl,
        sort_keys=[(k, "ascending") for k in key_cols] + [("__o", "descending")],
    )
    keys_sorted = [pc.take(a, idx) for a in keys]
    mask = _first_of_key_mask(*keys_sorted)
    idx_np = idx.to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(mask)
    win_local = idx_np[starts]
    win_global = win_local if row_sel is None else row_sel[win_local]
    out = t.take(pa.array(win_global, pa.int64()))
    reducers = [
        (c, np.add, 0)
        for c in ((count_col,) if count_col else ()) + tuple(sum_cols)
        if c and c in t.column_names
    ]
    reducers += [(c, np.minimum, np.inf) for c in min_cols
                 if c in t.column_names]
    reducers += [(c, np.maximum, -np.inf) for c in max_cols
                 if c in t.column_names]
    for c, ufunc, null_fill in reducers:
        col = t.column(c)
        field_type = t.schema.field(c).type
        nullm = None  # row null mask (int min/max path only)
        if ufunc is np.add:
            # exact: null→0 in Arrow keeps integer dtype end to end
            vals = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
        elif pa.types.is_integer(field_type):
            # integer min/max must stay integer: the ±inf-via-float64
            # sentinel loses precision above 2^53 (hash-like ids, big
            # counters).  Fill nulls with the dtype's iinfo bound and
            # null out all-null groups via an explicit valid count.
            info = np.iinfo(field_type.to_pandas_dtype())
            sentinel = info.max if ufunc is np.minimum else info.min
            if col.null_count > 0:
                nullm = pc.is_null(col).to_numpy(zero_copy_only=False)
            vals = pc.fill_null(col, sentinel).to_numpy(zero_copy_only=False)
        else:
            vals = col.to_numpy(zero_copy_only=False)
            if col.null_count > 0 or vals.dtype.kind == "f":
                # nulls (and NaNs) must not win a min/max: ±inf sentinel
                vals = vals.astype(np.float64)
                vals = np.where(np.isnan(vals), null_fill, vals)
        vals = vals if row_sel is None else vals[row_sel]
        vals = vals[idx_np]
        reduced = ufunc.reduceat(vals, starts) if len(starts) else vals[:0]
        if nullm is not None:
            # all-null groups (valid count 0) reduce to the sentinel → null
            nv = (~nullm).astype(np.int64)
            nv = nv if row_sel is None else nv[row_sel]
            nv = nv[idx_np]
            valid = np.add.reduceat(nv, starts) if len(starts) else nv[:0]
            bad = valid == 0
            arr = pa.array(reduced).cast(field_type)
            if bad.any():
                arr = pc.if_else(pa.array(bad), pa.nulls(len(arr), field_type),
                                 arr)
        elif ufunc is not np.add and reduced.dtype.kind == "f":
            # group of only nulls reduced to the sentinel → null out
            bad = ~np.isfinite(reduced)
            arr = pa.array(np.where(bad, 0, reduced)).cast(field_type)
            if bad.any():
                arr = pc.if_else(pa.array(bad), pa.nulls(len(arr), field_type),
                                 arr)
        else:
            arr = pa.array(reduced).cast(field_type)
        ci = out.schema.get_field_index(c)
        out = out.set_column(ci, c, arr)
    return out


def partial_lww(batch: pa.Table, spec=None) -> pa.Table:
    """Per-block combiner: fold live rows, compress orphans to counters.
    Generic over TableSpec (key/order/op columns); default = the
    repo-files CDC spec."""
    from ..schema import REPO_FILES

    spec = spec or REPO_FILES
    if batch.num_rows == 0:
        return batch.append_column("n_events", pa.array([], pa.int64()))
    batch = batch.append_column(
        "n_events", pa.array(np.ones(batch.num_rows, dtype=np.int64))
    )
    # index-level routing: a boolean filter of the whole wide table
    # copies every payload byte (measured ~12s per 600 MB block); the
    # fold gathers wide columns only for the winner rows, and orphan
    # counters only ever need 4 narrow columns
    orphaned_np = (
        batch.column("orphaned").combine_chunks().to_numpy(zero_copy_only=False)
    )
    live_sel = np.flatnonzero(~orphaned_np)
    winners = _fold_lww_sel(
        batch, None if len(live_sel) == batch.num_rows else live_sel,
        "n_events", spec.key, spec.order_col,
        **agg_kwargs(spec),
    )
    nullable = pa.schema([f.with_nullable(True) for f in winners.schema])
    winners = winners.cast(nullable)
    if len(live_sel) != batch.num_rows:
        narrow = batch.select(
            ["part_id", spec.order_col, "n_events", "schema_version"]
        )
        orphans = narrow.filter(pa.array(orphaned_np))
        counters = _orphan_counters(orphans, nullable, spec)
        winners = pa.concat_tables([winners, counters.cast(nullable)])
    return winners


def _orphan_counters(orphans: pa.Table, schema: pa.Schema, spec) -> pa.Table:
    """One counter row per (part_id) summarizing orphaned events in this
    block: n_events = count, order col = max seq (keeps watermarks
    monotonic past rolled-back ranges).  All payload columns null except
    the sentinel key (empty strings can't collide with real keys)."""
    grouped = (
        orphans.select(["part_id", spec.order_col, "n_events", "schema_version"])
        .group_by("part_id")
        .aggregate(
            [(spec.order_col, "max"), ("n_events", "sum"), ("schema_version", "max")]
        )
    )
    n = grouped.num_rows
    cols = []
    for f in schema:
        if f.name == spec.order_col:
            cols.append(grouped.column(f"{spec.order_col}_max").cast(f.type))
        elif f.name == spec.op_col:
            cols.append(pa.array([ORPHAN_OP] * n, pa.string()).cast(f.type))
        elif f.name == "part_id":
            cols.append(grouped.column("part_id").cast(f.type))
        elif f.name == "orphaned":
            cols.append(pa.array([True] * n).cast(f.type))
        elif f.name == "schema_version":
            cols.append(grouped.column("schema_version_max").cast(f.type))
        elif f.name == "n_events":
            cols.append(grouped.column("n_events_sum").cast(f.type))
        elif f.name in spec.key and pa.types.is_string(f.type):
            cols.append(pa.array([""] * n, pa.string()))
        elif f.name in spec.key and pa.types.is_integer(f.type):
            # sentinel far outside any real key space
            cols.append(pa.nulls(n, f.type).fill_null(-(2**62)))
        elif f.name in spec.key:
            cols.append(pa.nulls(n, f.type))
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.table(cols, schema=schema)
