"""Reshape operators: pivot (long→wide) and unpivot/melt (wide→long).

The reference has no reshape ops (its tables are born wide —
e.g. topics spread to topic0..3, SURVEY.md M3); these close the
standard query-surface gap the same way the window family does.

Scale shape
-----------
- ``pivot_counts``: the category domain must be SMALL and KNOWN (it
  becomes the schema — same contract as every SQL PIVOT).  Each batch
  folds to at most one row per key present in the batch with one count
  column per category (vectorized mask-sums), so the shuffle moves
  pre-aggregated wide rows, not events; a tiny ``groupby(key).sum``
  finishes.  At 10^10 rows the exchange volume is O(distinct keys ×
  batches), the classic partial-agg bound.
- ``unpivot``: stateless per-batch melt (columns → stacked rows) —
  embarrassingly parallel, no shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def pivot_counts(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    categories: list[str],
    prefix: str = "n_",
) -> ray.data.Dataset:
    """Wide per-``key`` occurrence counts of ``col`` over a fixed
    ``categories`` domain.  Values outside ``categories`` are ignored
    (mirror with a WHERE/FILTER in any SQL oracle)."""

    out_cols = [prefix + c for c in categories]

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(key)
        uniq = pc.unique(keys)
        idx = pc.index_in(keys, value_set=uniq).to_numpy(zero_copy_only=False)
        cols = {key: uniq}
        for cat, out in zip(categories, out_cols):
            m = pc.equal(t.column(col), cat).fill_null(False).to_numpy(
                zero_copy_only=False
            )
            cols[out] = pa.array(
                np.bincount(idx, weights=m, minlength=len(uniq)).astype(np.int64)
            )
        return pa.table(cols)

    wide = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = wide.groupby(key).sum(out_cols)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [key if c == key else c[len("sum(") : -1] for c in t.column_names]
        )

    return agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def _finest_counts(
    ds: ray.data.Dataset, cols: list[str], count_name: str
) -> ray.data.Dataset:
    """ONE distributed aggregation: per-batch partial counts →
    groupby-sum — the usual partial-agg exchange bound.  Shared by
    rollup_counts / cube_counts; every coarser grouping level is then
    derived from this (already small) result, never from the input."""

    def partial(t: pa.Table) -> pa.Table:
        sub = t.select(cols)
        grouped = sub.group_by(cols).aggregate([([], "count_all")])
        return grouped.rename_columns(cols + [count_name])

    finest = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(cols)
        .sum(count_name)
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [count_name if c == f"sum({count_name})" else c
             for c in t.column_names]
        )

    return finest.map_batches(rename, batch_format="pyarrow",
                              zero_copy_batch=True)


def rollup_counts(
    ds: ray.data.Dataset,
    cols: list[str],
    count_name: str = "n",
) -> ray.data.Dataset:
    """GROUP BY ROLLUP(cols): row counts at every prefix grouping of
    ``cols`` (finest → … → grand total), rolled-up columns NULL —
    matching SQL ROLLUP output shape.

    Scale shape: one distributed pass for the finest level
    (`_finest_counts`); every coarser level is derived from the
    previous (already aggregated, far smaller) level by another
    groupby-sum — no second pass over the input.
    """
    finest = _finest_counts(ds, cols, count_name)

    levels = [finest]
    prev = finest
    for depth in range(len(cols) - 1, -1, -1):
        keep, dropped = cols[:depth], cols[depth:]

        def roll(t: pa.Table, keep=keep, dropped=dropped) -> pa.Table:
            if keep:
                g = t.select(keep + [count_name]).group_by(keep).aggregate(
                    [(count_name, "sum")]
                ).rename_columns(keep + [count_name])
            else:
                g = pa.table(
                    {count_name: pa.array(
                        [pc.sum(t.column(count_name)).as_py() or 0], pa.int64()
                    )}
                )
            for c in dropped:
                g = g.append_column(
                    c, pa.nulls(g.num_rows, t.column(c).type)
                )
            return g.select(cols + [count_name])

        # each coarser level folds the previous one: tiny input, but the
        # fold itself still runs distributed (repartition keeps one
        # final combine per level)
        level = prev.map_batches(
            roll, batch_format="pyarrow", batch_size=None
        ).repartition(1).map_batches(
            roll, batch_format="pyarrow", batch_size=None
        )
        levels.append(level)
        prev = level

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def cube_counts(
    ds: ray.data.Dataset,
    cols: list[str],
    count_name: str = "n",
) -> ray.data.Dataset:
    """GROUP BY CUBE(cols): row counts at EVERY subset grouping of
    ``cols`` (2^k grouping sets), dropped columns NULL — matching SQL
    CUBE output shape.  Same scale shape as rollup: one distributed
    pass builds the finest level, every other subset folds that small
    result (2^k - 1 tiny groupby-sums, never the input)."""
    from itertools import combinations

    finest = _finest_counts(ds, cols, count_name)

    def fold_subset(t: pa.Table, keep: list[str]) -> pa.Table:
        dropped = [c for c in cols if c not in keep]
        if keep:
            g = t.select(keep + [count_name]).group_by(keep).aggregate(
                [(count_name, "sum")]
            ).rename_columns(keep + [count_name])
        else:
            g = pa.table(
                {count_name: pa.array(
                    [pc.sum(t.column(count_name)).as_py() or 0], pa.int64()
                )}
            )
        for c in dropped:
            g = g.append_column(c, pa.nulls(g.num_rows, t.column(c).type))
        return g.select(cols + [count_name])

    out = finest
    for r in range(len(cols) - 1, -1, -1):
        for keep in combinations(cols, r):
            keep = list(keep)

            def fold(t: pa.Table, keep=keep) -> pa.Table:
                return fold_subset(t, keep)

            level = finest.map_batches(
                fold, batch_format="pyarrow", batch_size=None
            ).repartition(1).map_batches(
                fold, batch_format="pyarrow", batch_size=None
            )
            out = out.union(level)
    return out


def unpivot(
    ds: ray.data.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> ray.data.Dataset:
    """Melt ``value_cols`` into (``var_name``, ``value_name``) rows,
    repeating ``id_cols`` — one zero-shuffle pass, batch-local."""

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        vtype = t.column(value_cols[0]).type
        parts = []
        for vc in value_cols:
            cols = {c: t.column(c) for c in id_cols}
            # constant label without a Python list: dictionary with one
            # entry, indices all-zero, cast to plain string
            cols[var_name] = pa.DictionaryArray.from_arrays(
                pa.array(np.zeros(n, dtype=np.int32)), pa.array([vc])
            ).cast(pa.string())
            cols[value_name] = t.column(vc).cast(vtype)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)
