"""Z-order (Morton) clustered Parquet layout — multi-column zone-map
pruning for analytical outputs.

The lake's data files are key-sorted for the streaming merge, which
makes single-column (commit_seq / key) zone maps sharp but leaves a
second predicate column scattered across every file.  Z-ordering
interleaves the bits of two quantized columns so rows close in BOTH
dimensions land in the same file/row-group — the classic Morton-curve
clustering (Morton 1966; the layout trick behind Delta OPTIMIZE ZORDER
and ClickHouse's mortonEncode index).  A rectangle predicate then
prunes on Parquet footer stats of BOTH columns at once.

Distributed shape: one Min/Max aggregate per column (driver holds 4
floats), one tagging pass (vectorized bit-spread, no Python rows), one
exchange into sampled Morton ranges, one sorted file write per range
(small row groups keep the zone maps fine-grained).  Scans prune
footer statistics for every predicate before any task is scheduled —
same protocol as pipelines/replay.py::pruned_parquet_scan, generalized
to a predicate LIST.
"""

from __future__ import annotations

import operator
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

_OPS = {"<": operator.lt, "<=": operator.le, "==": operator.eq,
        ">=": operator.ge, ">": operator.gt}


def _spread_bits(x: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 32 bits (uint64 in/out)."""
    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def morton2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Morton code of two quantized uint vectors (a even bits, b odd)."""
    return (_spread_bits(a) | (_spread_bits(b) << np.uint64(1))).astype(
        np.uint64
    )


def _quantize(v: np.ndarray, lo: float, hi: float, bits: int) -> np.ndarray:
    span = hi - lo
    if span <= 0:
        return np.zeros(len(v), np.uint64)
    q = ((v.astype(np.float64) - lo) / span * ((1 << bits) - 1))
    return np.clip(q, 0, (1 << bits) - 1).astype(np.uint64)


def zorder_write(
    ds: ray.data.Dataset,
    out_dir: str,
    cols: tuple[str, str],
    *,
    bits: int = 16,
    num_files: int = 16,
    row_group_size: int = 4096,
    sample_per_block: int = 96,
) -> list[str]:
    """Write ``ds`` as a Z-order-clustered Parquet directory: files are
    contiguous Morton ranges (sampled boundaries, balanced under any
    distribution), rows within a file sorted by Morton code, row
    groups small enough that footer zone maps stay sharp on both
    ``cols``.  Returns the file list (deterministic names)."""
    from ray.data.aggregate import Max, Min

    c1, c2 = cols
    agg = ds.aggregate(
        Min(c1, alias_name="lo1"), Max(c1, alias_name="hi1"),
        Min(c2, alias_name="lo2"), Max(c2, alias_name="hi2"),
    )
    lo1, hi1 = float(agg["lo1"]), float(agg["hi1"])
    lo2, hi2 = float(agg["lo2"]), float(agg["hi2"])

    def tag(t: pa.Table) -> pa.Table:
        v1 = t.column(c1).combine_chunks().to_numpy(zero_copy_only=False)
        v2 = t.column(c2).combine_chunks().to_numpy(zero_copy_only=False)
        z = morton2(
            _quantize(v1, lo1, hi1, bits), _quantize(v2, lo2, hi2, bits)
        ).astype(np.int64)  # bits<=31 keeps the code in int64
        return t.append_column("__z", pa.array(z, pa.int64()))

    tagged = ds.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # sampled Morton-range boundaries (same recipe as functions/sort.py)
    rows = tagged.map_batches(
        lambda t: pa.table(
            {
                "k": pc.take(
                    t.column("__z"),
                    pa.array(
                        np.arange(
                            0,
                            t.num_rows,
                            max(1, t.num_rows // sample_per_block),
                            dtype=np.int64,
                        )[:sample_per_block]
                    ),
                )
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    s = np.sort(np.array([r["k"] for r in rows], dtype=np.int64))
    cut_idx = (np.arange(1, num_files) * len(s)) // num_files
    bounds = np.unique(s[cut_idx]) if len(s) else np.array([], np.int64)

    os.makedirs(out_dir, exist_ok=True)

    def route(t: pa.Table) -> pa.Table:
        z = t.column("__z").to_numpy(zero_copy_only=False)
        r = np.searchsorted(bounds, z, side="right")
        return t.append_column("__r", pa.array(r, pa.int64()))

    def write_range(g: pa.Table) -> pa.Table:
        r = int(g.column("__r")[0].as_py())
        g = g.sort_by([("__z", "ascending")]).drop_columns(["__r", "__z"])
        path = os.path.join(out_dir, f"z-{r:05d}.parquet")
        pq.write_table(g, path, row_group_size=row_group_size)
        return pa.table(
            {
                "file": pa.array([path]),
                "rows": pa.array([g.num_rows], pa.int64()),
            }
        )

    stats = (
        tagged.map_batches(route, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("__r")
        .map_groups(write_range, batch_format="pyarrow")
        .take_all()
    )
    return sorted(row["file"] for row in stats)


def prune_files(
    files: list[str], predicates: list[tuple[str, str, object]]
) -> list[str]:
    """Zone-map prune: keep a file only if EVERY predicate intersects
    at least one of its row groups' footer [min, max] ranges."""
    keep = []
    for f in files:
        md = pq.read_metadata(f)
        ok = True
        for col, op, val in predicates:
            ci = next(
                i for i in range(md.num_columns)
                if md.schema.column(i).path == col
            )
            hit = False
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    hit = True
                    break
                lo, hi = st.min, st.max
                if op == "==" and lo <= val <= hi:
                    hit = True
                elif op in ("<", "<=") and _OPS[op](lo, val):
                    hit = True
                elif op in (">", ">=") and _OPS[op](hi, val):
                    hit = True
                if hit:
                    break
            if not hit:
                ok = False
                break
        if ok:
            keep.append(f)
    return keep


def zorder_scan(
    out_dir: str,
    predicates: list[tuple[str, str, object]],
    *,
    columns: list[str] | None = None,
) -> tuple[ray.data.Dataset, int, int]:
    """Scan a z-ordered directory with multi-column zone-map pruning;
    survivors stream through an exact vectorized row filter.  Returns
    (Dataset, files_read, files_total)."""
    import glob

    files = sorted(glob.glob(os.path.join(out_dir, "z-*.parquet")))
    keep = prune_files(files, predicates)
    if not keep:
        schema = pq.read_schema(files[0]) if files else pa.schema([])
        cols = columns or [f.name for f in schema]
        empty = pa.table(
            {c: pa.array([], schema.field(c).type) for c in cols}
        )
        return ray.data.from_arrow(empty), 0, len(files)

    need = set(columns or []) | {c for c, _, _ in predicates}
    ds = ray.data.read_parquet(
        keep, columns=sorted(need) if columns else None
    )

    def row_filter(t: pa.Table) -> pa.Table:
        mask = None
        for col, op, val in predicates:
            fns = {"<": pc.less, "<=": pc.less_equal, "==": pc.equal,
                   ">=": pc.greater_equal, ">": pc.greater}
            m = fns[op](t.column(col), val)
            mask = m if mask is None else pc.and_(mask, m)
        t = t.filter(mask)
        return t.select(columns) if columns else t

    return (
        ds.map_batches(row_filter, batch_format="pyarrow",
                       zero_copy_batch=True),
        len(keep),
        len(files),
    )
