"""Distributed joins, Ray-Data-first.

The reference needs only positional/broadcast joins (SURVEY.md §2.4 —
tx×receipt alignment, block-header broadcast), which this engine covers
in the CDC pipeline itself.  For the wider training-data surface we add
the two general patterns Ray Data lacks as built-ins in this version:

- ``hash_join``: both sides large → explicit partitioned hash join.
  Each side gets ``bucket = key_hash64(key) % B``; the two sides ride
  ONE union (padded to a common schema) into ``groupby(bucket)``, and
  each group joins its two halves with Arrow's native ``Table.join``
  (Acero) — no pandas conversion, no per-row copies.
- ``asof_join``: per-key as-of matching (latest right row with
  ts <= left ts).  Same bucket exchange; inside a bucket the match is
  one vectorized ``np.searchsorted`` over a (key-code, ts-rank)
  composite, so the group count is B, not O(keys).  The right side is
  deterministically pre-reduced to ONE row per (by, on) — the max of
  the carried value columns — so tie-breaks are well-defined and match
  the documented oracle semantics.

Skew: a hot key concentrates its bucket.  Both joins take
``salt=S > 1``: the LEFT (probe) side spreads each bucket over S
sub-buckets round-robin while the RIGHT (build) side is replicated
into all S — the classic salted-join trade (S× build-side duplication
for S× hot-bucket parallelism).  Use a small S and a build side that
is the smaller input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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
    salt: int = 1,
) -> tuple[ray.data.Dataset, pa.Schema]:
    """Tag both sides with ``__bucket`` and ``__side`` and union them.

    With ``salt > 1`` the left side lands in bucket*salt + (row % salt)
    and every right row is replicated to all ``salt`` sub-buckets, so a
    hot key's probe rows split across ``salt`` groups.
    """
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
            if salt <= 1:
                t = t.append_column("__bucket", pa.array(b))
                t = t.append_column("__side", pa.array([side] * t.num_rows))
                return _pad_to(t, target)
            if side == "l":
                sb = b * salt + (np.arange(len(b), dtype=np.int64) % salt)
                t = t.append_column("__bucket", pa.array(sb))
                t = t.append_column("__side", pa.array([side] * t.num_rows))
                return _pad_to(t, target)
            # build side: replicate to all sub-buckets
            parts = []
            for s in range(salt):
                p = t.append_column("__bucket", pa.array(b * salt + s))
                p = p.append_column("__side", pa.array([side] * t.num_rows))
                parts.append(_pad_to(p, target))
            return pa.concat_tables(parts)

        return fn

    # coalesce small input blocks (batch_size concats up to the cap):
    # the downstream sort pays a fixed per-block cost, and tiny tables
    # otherwise arrive as dozens of near-empty blocks
    ds = left.map_batches(
        tag("l"), batch_format="pyarrow", batch_size=32768,
        zero_copy_batch=True,
    )
    ds = ds.union(
        right.map_batches(
            tag("r"), batch_format="pyarrow", batch_size=32768,
            zero_copy_batch=True,
        )
    )
    return ds, target


def _bloom_positions(h: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """k bit positions per key via double hashing (Kirsch–Mitzenmacher):
    pos_i = h1 + i*h2 mod n_bits, both mixed from the engine's
    value-pure key hash."""
    from .hashing import _mix64

    h1 = _mix64(h.astype(np.uint64))
    h2 = _mix64(h1 ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    pos = np.empty((k, len(h)), dtype=np.uint64)
    for i in range(k):
        pos[i] = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
    return pos


def build_bloom(
    ds: ray.data.Dataset,
    keys: list[str],
    *,
    n_bits: int = 1 << 20,
    k: int = 4,
) -> np.ndarray:
    """Distributed Bloom filter over the key tuples of ``ds``: each
    block folds its keys into a local packed uint64 bit array, arrays
    OR-merge up Ray's aggregate combine tree — the driver sees one
    ``n_bits/8``-byte filter, never the keys.  No false negatives, so
    pruning with it cannot change a join result."""
    from ray.data.aggregate import AggregateFn

    words = n_bits // 64

    def acc(a: np.ndarray, block: pa.Table) -> np.ndarray:
        h = key_hash64(*[block.column(c) for c in keys])
        pos = _bloom_positions(h, n_bits, k).reshape(-1)
        a = a.copy()
        np.bitwise_or.at(
            a, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )
        return a

    agg = AggregateFn(
        init=lambda _: np.zeros(words, dtype=np.uint64),
        merge=lambda a, b: a | b,
        accumulate_block=acc,
        name="bloom",
    )
    return ds.aggregate(agg)["bloom"]


def _bloom_test(bloom: np.ndarray, h: np.ndarray, k: int) -> np.ndarray:
    n_bits = len(bloom) * 64
    pos = _bloom_positions(h, n_bits, k)
    hit = np.ones(len(h), dtype=bool)
    for i in range(k):
        word = bloom[(pos[i] >> np.uint64(6)).astype(np.int64)]
        hit &= ((word >> (pos[i] & np.uint64(63))) & np.uint64(1)).astype(bool)
    return hit


#: public ``how`` names → Acero join types.  Every variant stays a
#: per-bucket local join: a key lives in exactly one bucket, so
#: null-extension (outer) and existence tests (semi/anti) decided
#: inside the bucket are globally correct.
_JOIN_TYPES = {
    "inner": "inner",
    "left": "left outer",
    "right": "right outer",
    "full": "full outer",
    "semi": "left semi",
    "anti": "left anti",
}


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str | list[str],
    *,
    num_buckets: int = 32,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    salt: int = 1,
    how: str = "inner",
    bloom_prune: bool | int = False,
) -> ray.data.Dataset:
    """Equi-join of two large datasets on ``key``.

    ``how``: inner | left | right | full | semi | anti (semi/anti emit
    left columns only).  Arrow-native: per-bucket ``pa.Table.join``
    (hash join in Acero) on the two filtered sides — zero pandas
    copies.  Column order is left columns then right non-key columns;
    collisions on the right get an ``_r`` suffix.

    Salting replicates the right side into every sub-bucket, so with
    ``salt > 1`` a right row appears in S groups: fine for inner/left
    (probe rows are still unique), wrong for right/full outer
    (unmatched right rows would be emitted S times) and for semi/anti
    only the probe side matters, so those remain allowed.

    ``bloom_prune`` (True, or an int bit count) builds a Bloom filter
    over the BUILD (right) side keys and drops probe rows that cannot
    match BEFORE the bucket exchange — at a selective join this is the
    difference between shuffling the whole probe table and shuffling
    the matching fraction.  No false negatives ⇒ identical results.
    Only legal when unmatched LEFT rows don't reach the output
    (inner / semi / right); left, full and anti must see every probe
    row, so it raises there.
    """
    if how not in _JOIN_TYPES:
        raise ValueError(f"how must be one of {sorted(_JOIN_TYPES)}")
    if salt > 1 and how in ("right", "full"):
        raise ValueError("salt > 1 duplicates unmatched right rows under "
                         "right/full outer joins; use salt=1")
    keys = [key] if isinstance(key, str) else list(key)
    if bloom_prune:
        if how not in ("inner", "semi", "right"):
            raise ValueError(
                "bloom_prune drops unmatched probe rows — only valid for "
                "inner/semi/right joins"
            )
        import ray as _ray

        n_bits = bloom_prune if isinstance(bloom_prune, int) and \
            bloom_prune is not True else (1 << 20)
        bloom_ref = _ray.put(build_bloom(right, keys, n_bits=n_bits))

        def prune(t: pa.Table) -> pa.Table:
            bloom = _ray.get(bloom_ref)
            h = key_hash64(*[t.column(c) for c in keys])
            return t.filter(pa.array(_bloom_test(bloom, h, 4)))

        left = left.map_batches(
            prune, batch_format="pyarrow", zero_copy_batch=True
        )
    ds, _ = _bucketed_union(left, right, keys, num_buckets, salt)
    lcols = left_cols or [f for f in left.schema().names]
    rcols = right_cols or [f for f in right.schema().names]
    lsel = sorted(set(lcols + keys))
    rsel = sorted(set(rcols + keys))
    join_type = _JOIN_TYPES[how]

    def join_bucket(group: pa.Table) -> pa.Table:
        lmask = pc.equal(group.column("__side"), "l")
        ltab = group.filter(lmask).select(lsel)
        rtab = group.filter(pc.invert(lmask)).select(rsel)
        return ltab.join(
            rtab, keys=keys, join_type=join_type, right_suffix="_r"
        ).combine_chunks()

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
    salt: int = 1,
) -> ray.data.Dataset:
    """Left as-of join: for each left row, the latest right row of the
    same ``by`` key with right.on <= left.on (direction=backward).

    Ties among right rows sharing (by, on) are resolved
    deterministically by keeping the row with the MAX (right_cols)
    tuple — mirror this in any SQL oracle by pre-aggregating the right
    side (``GROUP BY by, on`` + ``max(col)``).

    Per bucket: both sides' ``by`` values are mapped to a shared code
    space (``pc.index_in`` against the sorted right keys), ``on``
    values are rank-encoded over the union of both sides, and a single
    ``np.searchsorted`` over the composite code*M+rank finds, for
    every left row at once, the last right row at or before it.
    """
    if direction != "backward":
        raise ValueError("only direction='backward' is implemented")
    ds, _ = _bucketed_union(left, right, by, num_buckets, salt)
    lsel = sorted(set(left_cols + [by, on]))
    rsel = sorted(set(right_cols + [by, on]))
    r_out = {c: (c + "_r" if c in set(left_cols + [by, on]) else c)
             for c in right_cols}

    def join_bucket(group: pa.Table) -> pa.Table:
        lmask = pc.equal(group.column("__side"), "l")
        ltab = group.filter(lmask).select(lsel)
        rtab = group.filter(pc.invert(lmask)).select(rsel)
        # deterministic tie-break: one right row per (by, on), max value tuple
        rtab = rtab.sort_by(
            [(by, "ascending"), (on, "ascending")]
            + [(c, "ascending") for c in right_cols]
        )
        r_on = rtab.column(on)
        l_on = ltab.column(on)
        if pa.types.is_timestamp(r_on.type) or pa.types.is_date(r_on.type):
            r_on = r_on.cast(pa.int64())
            l_on = l_on.cast(pa.int64())
        rn = r_on.to_numpy(zero_copy_only=False)
        ln = l_on.to_numpy(zero_copy_only=False)
        r_keys = pc.unique(rtab.column(by))  # appearance order == sorted
        r_code = pc.index_in(rtab.column(by), value_set=r_keys).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        l_code_arr = pc.index_in(ltab.column(by), value_set=r_keys)
        l_code = l_code_arr.fill_null(-1).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        uniq = np.unique(np.concatenate([rn, ln])) if len(rn) + len(ln) else rn
        M = np.int64(len(uniq) + 1)
        comp_r = r_code * M + np.searchsorted(uniq, rn)
        # keep-last per (by, on): rows are sorted by comp_r with the max
        # value tuple last inside each tie group
        if len(comp_r):
            keep = np.empty(len(comp_r), dtype=bool)
            keep[:-1] = comp_r[1:] != comp_r[:-1]
            keep[-1] = True
            rtab = rtab.filter(pa.array(keep))
            comp_r = comp_r[keep]
        comp_l = l_code * M + np.searchsorted(uniq, ln)
        idx = np.searchsorted(comp_r, comp_l, side="right") - 1
        valid = (idx >= 0) & (l_code >= 0)
        if len(comp_r):
            valid &= np.where(
                idx >= 0,
                np.take(comp_r // M, np.clip(idx, 0, None)) == l_code,
                False,
            )
        else:
            valid[:] = False
        idx_arr = pa.array(idx.astype(np.int64), mask=~valid)
        cols = {c: ltab.column(c) for c in lsel}
        for c in right_cols:
            cols[r_out[c]] = pc.take(rtab.column(c), idx_arr)
        return pa.table(cols)

    return ds.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def range_join(
    points: ray.data.Dataset,
    intervals: ray.data.Dataset,
    *,
    on: str,
    lo: str,
    hi: str,
    point_cols: list[str],
    interval_cols: list[str],
    boundaries: list[float] | None = None,
    num_chunks: int = 32,
) -> ray.data.Dataset:
    """Interval (range) join: every (point, interval) pair with
    ``interval.lo <= point.on < interval.hi``.

    The reference needs only equi/positional joins; this is one of the
    "custom operators Ray Data lacks" the task brief names (as-of,
    RANGE join, windowed aggregate).  Distributed shape:

    - The ``on`` domain is cut into ``num_chunks`` contiguous chunks
      (explicit ``boundaries``, else uniform between the points' global
      min/max — one cheap aggregate pass).
    - Each point lands in exactly ONE chunk; each interval is
      replicated to every chunk it overlaps (one extra row per crossed
      boundary — cheap while intervals are narrow relative to the
      chunk width; a degenerate full-domain interval replicates
      everywhere, at which point use a broadcast join instead).
    - Both sides ride one padded union into ``groupby(__chunk)``;
      inside a chunk the sweep is fully vectorized: intervals sorted by
      ``lo``, candidate window per point bounded by the chunk's max
      interval width via two ``np.searchsorted`` calls, candidate
      expansion with ``np.repeat``/``arange``, then one mask
      ``hi > on``.  Per-chunk cost O((P + I)·log I + candidates).

    Because a point belongs to exactly one chunk, each matching pair is
    emitted exactly once — no cross-chunk dedup pass is needed.

    Skew note: the max-width candidate bound means ONE wide interval in
    a chunk widens every point's candidate scan in that chunk; keep
    wide intervals on the broadcast path or pass finer ``boundaries``.
    """
    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min

    if boundaries is None:
        mm = points.aggregate(_Min(on), _Max(on))
        vmin, vmax = float(mm[f"min({on})"]), float(mm[f"max({on})"])
        if not vmax > vmin:
            boundaries = []
        else:
            step = (vmax - vmin) / num_chunks
            boundaries = [vmin + step * i for i in range(1, num_chunks)]
    inner = np.asarray(boundaries, dtype=np.float64)

    p_schema = points.schema().base_schema
    i_schema = intervals.schema().base_schema
    target = _union_schema(p_schema, i_schema).append(
        pa.field("__chunk", pa.int64())
    ).append(pa.field("__side", pa.string()))

    def tag_points(t: pa.Table) -> pa.Table:
        v = t.column(on).to_numpy(zero_copy_only=False).astype(np.float64)
        c = np.searchsorted(inner, v, side="right").astype(np.int64)
        t = t.append_column("__chunk", pa.array(c))
        t = t.append_column("__side", pa.array(["p"] * t.num_rows))
        return _pad_to(t, target)

    def tag_intervals(t: pa.Table) -> pa.Table:
        lov = t.column(lo).to_numpy(zero_copy_only=False).astype(np.float64)
        hiv = t.column(hi).to_numpy(zero_copy_only=False).astype(np.float64)
        c0 = np.searchsorted(inner, lov, side="right").astype(np.int64)
        c1 = np.searchsorted(inner, hiv, side="left").astype(np.int64)
        c1 = np.maximum(c1, c0)  # empty/reversed intervals: land once
        counts = c1 - c0 + 1
        total = int(counts.sum())
        row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        offs = np.cumsum(counts) - counts
        chunk = np.repeat(c0, counts) + (np.arange(total, dtype=np.int64)
                                         - np.repeat(offs, counts))
        t = t.take(pa.array(row_idx))
        t = t.append_column("__chunk", pa.array(chunk))
        t = t.append_column("__side", pa.array(["i"] * t.num_rows))
        return _pad_to(t, target)

    ds = points.map_batches(
        tag_points, batch_format="pyarrow", batch_size=32768,
        zero_copy_batch=True,
    ).union(
        intervals.map_batches(
            tag_intervals, batch_format="pyarrow", batch_size=32768,
            zero_copy_batch=True,
        )
    )

    psel = sorted(set(point_cols + [on]))
    isel = sorted(set(interval_cols + [lo, hi]))
    i_out = {c: (c + "_r" if c in set(psel) else c) for c in isel}

    def join_chunk(group: pa.Table) -> pa.Table:
        pmask = pc.equal(group.column("__side"), "p")
        ptab = group.filter(pmask).select(psel)
        itab = group.filter(pc.invert(pmask)).select(isel)
        if ptab.num_rows == 0 or itab.num_rows == 0:
            cols = {c: pa.nulls(0, ptab.schema.field(c).type) for c in psel}
            for c in isel:
                cols[i_out[c]] = pa.nulls(0, itab.schema.field(c).type)
            return pa.table(cols)
        itab = itab.sort_by([(lo, "ascending")])
        starts = itab.column(lo).to_numpy(zero_copy_only=False).astype(np.float64)
        ends = itab.column(hi).to_numpy(zero_copy_only=False).astype(np.float64)
        v = ptab.column(on).to_numpy(zero_copy_only=False).astype(np.float64)
        w_max = float(np.max(ends - starts)) if len(starts) else 0.0
        hi_idx = np.searchsorted(starts, v, side="right")
        lo_idx = np.searchsorted(starts, v - w_max, side="left")
        counts = hi_idx - lo_idx
        total = int(counts.sum())
        p_idx = np.repeat(np.arange(len(v), dtype=np.int64), counts)
        offs = np.cumsum(counts) - counts
        cand = (np.repeat(lo_idx, counts)
                + (np.arange(total, dtype=np.int64) - np.repeat(offs, counts)))
        keep = ends[cand] > v[p_idx]
        p_idx, cand = p_idx[keep], cand[keep]
        cols = {c: pc.take(ptab.column(c), pa.array(p_idx)) for c in psel}
        for c in isel:
            cols[i_out[c]] = pc.take(itab.column(c), pa.array(cand))
        return pa.table(cols)

    return ds.groupby("__chunk").map_groups(join_chunk, batch_format="pyarrow")


def broadcast_join(
    left: ray.data.Dataset,
    right_tbl: pa.Table,
    key: str | list[str],
    *,
    how: str = "inner",
    right_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Zero-shuffle join against a SMALL materialized right table: the
    build side goes to the object store once (``ray.put``) and every
    batch Acero-joins against it locally — no exchange at all.  The
    generalization of the reference's block-header broadcast (SURVEY
    §2.4).  right/full are not offered: an unmatched-right audit needs
    the bucketed join."""
    import ray as _ray

    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError("broadcast_join supports inner/left/semi/anti")
    keys = [key] if isinstance(key, str) else list(key)
    if right_cols is not None:
        right_tbl = right_tbl.select(sorted(set(right_cols + keys)))
    r_ref = _ray.put(right_tbl.combine_chunks())
    join_type = _JOIN_TYPES[how]

    def jb(t: pa.Table) -> pa.Table:
        rt = _ray.get(r_ref)
        return t.join(
            rt, keys=keys, join_type=join_type, right_suffix="_r"
        ).combine_chunks()

    return left.map_batches(jb, batch_format="pyarrow", zero_copy_batch=True)


def auto_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str | list[str],
    *,
    how: str = "inner",
    broadcast_max_rows: int = 2_000_000,
    num_buckets: int = 32,
    salt: int = 1,
    bloom_prune: bool | int = False,
    explain: bool = False,
):
    """Size-adaptive join planner: count the build (right) side — a
    metadata-cheap operation for Parquet-backed datasets — and pick
    the zero-shuffle broadcast join when it fits the object store
    comfortably, else the bucketed salted hash join.  ``explain=True``
    additionally returns the chosen plan ({strategy, right_rows}).

    The same decision the CDC pipeline makes statically (dimension
    broadcasts vs the spool exchange), exposed as a general operator
    so composed pipelines don't hand-tune every join at every scale."""
    n_right = right.count()
    can_bcast = how in ("inner", "left", "semi", "anti")
    if n_right <= broadcast_max_rows and can_bcast:
        rt = pa.Table.from_pylist(right.take_all())
        if rt.num_rows == 0:
            schema = right.schema()
            base = getattr(schema, "base_schema", None)
            if base is not None:
                rt = base.empty_table()
        out = broadcast_join(left, rt, key, how=how)
        plan = {"strategy": "broadcast", "right_rows": n_right}
    else:
        out = hash_join(
            left, right, key,
            how=how, num_buckets=num_buckets, salt=salt,
            bloom_prune=bloom_prune,
        )
        plan = {"strategy": "bucketed", "right_rows": n_right}
    return (out, plan) if explain else out
