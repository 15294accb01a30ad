"""Normalize stage: schema-unify + hash partition id + orphan tagging.
One vectorized ``map_batches`` pass over zero-copy Arrow batches.

Re-expresses the reference's per-block transform fan-out
(src/ch_eth/schema.rs:32-63 BlockRow::from_ethers and friends — project
+ normalize + hash-format) as a single batch projection, plus the
rollback orphan-range check that the reference does per-head as
DELETE+reinsert (src/ch_eth/sync.rs:92-116): in a batch fold we instead
*tag* orphaned events so they never win LWW but still advance
watermarks and lineage counters.

Generic over :class:`~web3research_etl_ray.schema.TableSpec` — the key
columns, LWW order column, op column and unified schema all come from
the spec (default: the repo-files CDC table).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import key_hash64
from ..schema import REPO_FILES, TableSpec, schema_version_of, unify_to


def depth_vector(num_partitions: int, split_depths: dict[int, int] | None):
    """Dense per-base-pid depth lookup (None when nothing is split)."""
    if not split_depths:
        return None
    vec = np.zeros(num_partitions, dtype=np.uint64)
    for b, k in split_depths.items():
        vec[int(b)] = int(k)
    return vec


def route_pids(
    h: np.ndarray, num_partitions: int, depth_vec: np.ndarray | None = None
) -> np.ndarray:
    """Extended partition ids from 64-bit key hashes.

    base = h % P; a base with split depth k spreads its keys over the
    extended ids {base + P*sub} with sub = (h % (P << k)) // P — see
    ``Manifest.split_depths``.  Depth 0 (or no splits) degenerates to
    plain ``h % P``, so unsplit lakes route exactly as before."""
    P = np.uint64(num_partitions)
    base = h % P
    if depth_vec is None:
        return base.astype(np.int64)
    k = depth_vec[base.astype(np.int64)]
    sub = (h % (P << k)) // P
    return (base + P * sub).astype(np.int64)


def orphan_mask(seqs: np.ndarray, ranges: list[tuple[int, int]]) -> np.ndarray:
    """Vectorized membership of commit_seq in any orphan range.

    ``ranges`` is the small rollback control table (FIXTURES.md §2),
    broadcast by closure — never shuffled.
    """
    if not ranges:
        return np.zeros(len(seqs), dtype=bool)
    srt = sorted(ranges)
    starts = np.array([lo for lo, _ in srt], dtype=np.int64)
    # Running max of ends handles nested/overlapping ranges, e.g.
    # [(80,120),(90,100)]: seq 105 lands on start 90 but must still be
    # flagged because an earlier range reaches 120. s is orphaned iff
    # some range j with start_j <= s has end_j >= s, and all such j
    # satisfy j <= searchsorted idx, so the cummax end is exact.
    ends = np.maximum.accumulate(np.array([hi for _, hi in srt], dtype=np.int64))
    idx = np.searchsorted(starts, seqs, side="right") - 1
    ok = idx >= 0
    out = np.zeros(len(seqs), dtype=bool)
    out[ok] = seqs[ok] <= ends[idx[ok]]
    return out


class Normalize:
    """Callable stage for ``map_batches``.

    Stateless enough to run as tasks, but shaped as a class so the
    compiled setup (range arrays, spec) happens once and travels as a
    broadcast closure — the reference's create-once-reuse pattern
    (src/ch_eth/init.rs:125-137).
    """

    def __init__(
        self,
        num_partitions: int,
        orphan_ranges: list[tuple[int, int]],
        spec: TableSpec = REPO_FILES,
        split_depths: dict[int, int] | None = None,
        purge: pa.Table | None = None,
    ):
        self.num_partitions = num_partitions
        self.ranges = sorted(orphan_ranges)
        self.spec = spec
        self.depth_vec = depth_vector(num_partitions, split_depths)
        # watermarked tombstones (pipelines/purge.py): events at or
        # below a purged key's purge_seq are dropped here, so EVERY
        # rebuild path (tick, repair, full rebuild, conformance check)
        # converges to the purged state.  O(erase requests) — broadcast
        # by closure, zero cost when no purge exists.
        self.purge_comp = None
        if purge is not None and purge.num_rows:
            from ..pipelines.purge import composite_key

            self.purge_comp = composite_key(purge, list(spec.key))
            self.purge_seq = purge.column("purge_seq").to_numpy(
                zero_copy_only=False
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        spec = self.spec
        version = schema_version_of(batch.schema)
        batch = unify_to(batch, spec.flight_schema)
        if batch.column(spec.op_col).null_count:
            # sources without an op column are pure upsert streams
            idx = batch.schema.get_field_index(spec.op_col)
            batch = batch.set_column(
                idx, spec.op_col, pc.fill_null(batch.column(spec.op_col), "upsert")
            )
        if self.purge_comp is not None and batch.num_rows:
            from ..pipelines.purge import composite_key

            idx = pc.index_in(
                composite_key(batch, list(spec.key)),
                value_set=self.purge_comp,
            )
            idxf = pc.fill_null(idx, -1).to_numpy(zero_copy_only=False)
            hit = idxf >= 0
            if hit.any():
                s = batch.column(spec.order_col).to_numpy(
                    zero_copy_only=False
                )
                drop = np.zeros(len(batch), dtype=bool)
                drop[hit] = s[hit] <= self.purge_seq[idxf[hit]]
                if drop.any():
                    batch = batch.filter(pa.array(~drop))
        seqs = batch.column(spec.order_col).to_numpy(zero_copy_only=False)
        orphaned = orphan_mask(seqs, self.ranges)
        pid = route_pids(
            key_hash64(*[batch.column(k) for k in spec.key]),
            self.num_partitions,
            self.depth_vec,
        )
        # any content-hash column is deliberately NOT computed here:
        # hashing every event costs O(events); the merge stage hashes
        # only the winners that reach the lake (O(keys)).
        return batch.append_column(
            "part_id", pa.array(pid, pa.int64())
        ).append_column(
            "orphaned", pa.array(orphaned)
        ).append_column(
            "schema_version", pa.array(np.full(len(batch), version, dtype=np.int8))
        )
