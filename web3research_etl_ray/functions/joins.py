"""Distributed joins, Ray-Data-first.

The reference needs only positional/broadcast joins (SURVEY.md §2.4 —
tx×receipt alignment, block-header broadcast), which this engine covers
in the CDC pipeline itself.  For the wider training-data surface we add
the two general patterns Ray Data lacks as built-ins in this version:

- ``hash_join``: both sides large → explicit partitioned hash join.
  Each side gets ``bucket = key_hash64(key) % B``; the two sides ride
  ONE union (padded to a common schema) into ``groupby(bucket)``, and
  each group joins its two halves with a vectorized pandas merge.
  Salt note: a hot key concentrates its bucket — pick B ≫ cores and
  split hot buckets by salting the *probe* side if profiles demand it.
- ``asof_join``: per-key as-of matching (latest right row with
  ts <= left ts).  Same bucket exchange; inside a bucket
  ``pd.merge_asof(by=key)`` handles all keys at once, so the group
  count is B, not O(keys).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .hashing import key_hash64


def _pad_to(t: pa.Table, target: pa.Schema) -> pa.Table:
    cols = []
    for f in target:
        if f.name in t.column_names:
            col = t.column(f.name)
            if col.type != f.type:
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(t.num_rows, f.type))
    return pa.table(cols, schema=target)


def _union_schema(left: pa.Schema, right: pa.Schema) -> pa.Schema:
    fields = {f.name: f for f in left}
    for f in right:
        if f.name not in fields:
            fields[f.name] = f
    return pa.schema(
        [pa.field(n, f.type, nullable=True) for n, f in fields.items()]
    )


def _bucketed_union(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str | list[str],
    num_buckets: int,
) -> tuple[ray.data.Dataset, pa.Schema]:
    keys = [key] if isinstance(key, str) else list(key)
    l_schema = left.schema().base_schema
    r_schema = right.schema().base_schema
    target = _union_schema(l_schema, r_schema).append(
        pa.field("__bucket", pa.int64())
    ).append(pa.field("__side", pa.string()))

    def tag(side):
        def fn(t: pa.Table) -> pa.Table:
            b = (
                key_hash64(*[t.column(k) for k in keys])
                % np.uint64(num_buckets)
            ).astype(np.int64)
            t = t.append_column("__bucket", pa.array(b))
            t = t.append_column("__side", pa.array([side] * t.num_rows))
            return _pad_to(t, target)

        return fn

    ds = left.map_batches(tag("l"), batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.union(
        right.map_batches(tag("r"), batch_format="pyarrow", zero_copy_batch=True)
    )
    return ds, target


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str | list[str],
    *,
    num_buckets: int = 32,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Inner equi-join of two large datasets on ``key``."""
    keys = [key] if isinstance(key, str) else list(key)
    ds, _ = _bucketed_union(left, right, keys, num_buckets)
    lcols = left_cols or [f for f in left.schema().names]
    rcols = right_cols or [f for f in right.schema().names]

    def join_bucket(group: pa.Table) -> pa.Table:
        import pandas as pd  # vectorized per-bucket merge

        df = group.to_pandas()
        ldf = df[df["__side"] == "l"][sorted(set(lcols + keys))]
        rdf = df[df["__side"] == "r"][sorted(set(rcols + keys))]
        out = ldf.merge(rdf, on=keys, how="inner")
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    by: str,
    on: str,
    left_cols: list[str],
    right_cols: list[str],
    num_buckets: int = 16,
    direction: str = "backward",
) -> ray.data.Dataset:
    """Left as-of join: for each left row, the latest right row of the
    same ``by`` key with right.on <= left.on (direction=backward)."""
    ds, _ = _bucketed_union(left, right, by, num_buckets)

    def join_bucket(group: pa.Table) -> pa.Table:
        import pandas as pd

        df = group.to_pandas()
        ldf = (
            df[df["__side"] == "l"][sorted(set(left_cols + [by, on]))]
            .sort_values(on, kind="mergesort")
        )
        rdf = (
            df[df["__side"] == "r"][sorted(set(right_cols + [by, on]))]
            .sort_values(on, kind="mergesort")
        )
        rdf = rdf.rename(
            columns={c: c + "_r" for c in right_cols if c in ldf.columns}
        )
        out = pd.merge_asof(
            ldf, rdf, on=on, by=by, direction=direction
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")
