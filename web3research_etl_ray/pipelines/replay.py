"""Replay pipeline — bounded backfill + incremental tail tick.

The Ray-Data-native re-expression of the reference's ``init`` loop
(src/ch_eth/init.rs:344-449: for num in from..=to → fetch → fan-out →
batched idempotent insert) and of one ``sync`` head-handling tick
(src/ch_eth/sync.rs:92-145).  Both collapse into ONE streaming plan:

    read_parquet(events, filter=order>watermark)   # file+row-group pruning
      → map_batches(Normalize ∘ partial_lww)  # unify, partition id, orphan
                                              # tag, per-block LWW combine
      → map_batches(fold, batch_size=256k)    # 2nd-level combiner across
                                              # winner blocks (~20x fewer
                                              # exchange rows at 50M events)
      → write_parquet(partition_cols=[part_id(,salt)])   # spool exchange
      → map_batches(SpoolMerger over pids)    # per-partition LWW merge +
                                              # partition write (tasks or
                                              # actor pool); exchange=
                                              # "groupby" = single streaming
                                              # execution for small ticks;
                                              # exchange="driver" = the
                                              # whole tick in-process (the
                                              # push-tail latency leg: same
                                              # closures, zero Ray
                                              # executions, fused tiny
                                              # merge under 16 MB scope)
      → take_all()                  # P small lineage rows only
      → commit manifest             # two-phase exactly-once publish

Because the producer side is at-least-once (Ray retries, resumed jobs
re-read events past the min watermark) and the sink is an idempotent
keyed LWW merge behind a manifest commit, a killed job resumes with
neither duplicate nor lost applies — the contract the reference gets
from ReplacingMergeTree + re-inserts (src/ch_eth/init.rs:435-448), made
exactly-once.

Scale notes (100 TB / 10^10 events):
- the shuffle moves only per-block LWW winners (≤ distinct keys per
  block), not raw events — hot keys (Zipf repos) collapse before the
  exchange, which together with hash partitioning over (repo, path) is
  the salt: a hot *repo* spreads across partitions by path hash, a hot
  *key* ships one row per block.
- ``num_partitions`` should be ~2-4× total cores; each merge group
  holds one partition of *distinct keys*, not events.
- event files are read with a commit_seq pushdown filter, so a tail
  tick touches only row groups past the watermark.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray.data

from ..oracle import load_rollback_ranges
from ..schema import REPO_FILES, TableSpec
from ..stages.lww import agg_kwargs, fold_lww, partial_lww
from ..stages.merge import ENTRY_SCHEMA, Merger, SpoolMerger, _empty_group
from ..stages.normalize import Normalize, depth_vector, route_pids
from ..state.manifest import (
    Manifest,
    PartitionEntry,
    acquire_lease,
    commit_manifest,
    committed_chain,
    extended_pids,
    list_tags,
    load_latest,
    load_manifest,
    partition_relpath,
    release_lease,
    resolve_tag,
)

DEFAULT_NUM_PARTITIONS = 32

#: auto-split a partition file past this many stored keys (None/0 in the
#: replay call disables).  Sized so test/bench lakes (≤ ~1M keys per
#: partition) never trigger while an unsplit 100×-grown production
#: partition does.
DEFAULT_SPLIT_THRESHOLD_ROWS = 4_000_000

#: hard cap on per-base split depth (2^16 files per base partition)
MAX_SPLIT_DEPTH = 16


def _expand_repair_pids(
    pids: frozenset[int], num_partitions: int, split_depths: dict[int, int]
) -> frozenset[int]:
    """Base-level repair requests (pid < P — what check()/repair() emit)
    expand to every extended id of that base; ids >= P are already
    extended and pass through."""
    out: set[int] = set()
    for pid in pids:
        pid = int(pid)
        if pid < num_partitions:
            k = int(split_depths.get(pid, 0))
            out.update(pid + num_partitions * s for s in range(1 << k))
        else:
            out.add(pid)
    return frozenset(out)


def event_files(stream_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(stream_dir, "events-*.parquet")))


def auto_partitions(files: list[str], target_bytes: int = 32 << 20) -> int:
    """Partition count from input volume: ~32 MB of compressed stream
    per partition, clamped to [DEFAULT, 1024].  Measured on the 50M
    soak (≈6.5 GB): auto → ~200, and P=256 beat P=512 by ~25% (fewer
    merge tasks / bigger per-task batches); tiny inputs stay at the
    default so test lakes keep their layout.  Only consulted on the
    FIRST generation — an existing lake pins its committed P."""
    total = sum(os.path.getsize(f) for f in files)
    return int(min(1024, max(DEFAULT_NUM_PARTITIONS, total // target_bytes)))


def _leaf_index(md, col: str) -> int:
    """PARQUET LEAF index of a top-level primitive column: nested
    columns (maps/lists/structs) flatten into multiple leaves, so the
    arrow schema position is NOT the statistics index."""
    return next(
        i for i in range(md.num_columns) if md.schema.column(i).path == col
    )


def _find_repair_pids(
    lake_dir: str,
    prior: Manifest | dict,
    new_ranges: list[tuple[int, int]],
    order_col: str = "commit_seq",
) -> frozenset[int]:
    """Partitions whose stored state may contain winners orphaned by a
    *new* rollback range: decided from Parquet footer min/max stats on
    commit_seq — metadata-only, no data read.  (At 10^10 scale this
    loop over P footers would itself be a small ray task fan-out.)

    ``prior`` is either a Manifest or a bare ``{pid: PartitionEntry}``
    dict (the multi-table fan-out passes per-table partition maps)."""
    if not new_ranges:
        return frozenset()
    partitions = prior if isinstance(prior, dict) else prior.partitions
    out = set()
    for pid, entry in partitions.items():
        if not entry.file:
            continue
        md = pq.ParquetFile(os.path.join(lake_dir, entry.file)).metadata
        schema_idx = _leaf_index(md, order_col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(schema_idx)
            st = col.statistics
            if st is None or not st.has_min_max:
                lo, hi = 0, 2**62  # no stats → assume affected
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is None:
            continue
        if any(not (hi < a or lo > b) for a, b in new_ranges):
            out.add(pid)
    return frozenset(out)


def _file_seq_ranges(
    files: list[str], lake_dir: str, order_col: str = "commit_seq"
) -> dict[str, tuple[int, int]]:
    """(min, max) commit_seq per event file from Parquet footers, with a
    persistent cache in the lake dir so a tail tick only opens footers
    of files it has never seen.  The cache key includes the file's
    absolute path, size and mtime: a rewritten/regenerated file (same
    basename, different bytes) or a lake re-pointed at a different
    stream dir therefore re-reads footers instead of pruning on stale
    ranges — pruning on a stale max would silently skip unapplied
    events, which idempotent LWW does NOT absorb."""
    import json

    cache_path = os.path.join(lake_dir, "file-ranges.json")
    cache: dict[str, list[int]] = {}
    if os.path.exists(cache_path):
        try:
            with open(cache_path) as fh:
                cache = json.load(fh)
        except (OSError, ValueError):
            cache = {}
    dirty = False
    out = {}
    seen_keys: set[str] = set()
    for f in files:
        st_f = os.stat(f)
        key = f"{os.path.abspath(f)}|{st_f.st_size}|{st_f.st_mtime_ns}"
        if key not in cache:
            md = pq.ParquetFile(f).metadata
            idx = _leaf_index(md, order_col)
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    lo, hi = -1, 2**62
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            cache[key] = [int(lo if lo is not None else -1),
                          int(hi if hi is not None else 2**62)]
            dirty = True
        out[f] = tuple(cache[key])
        seen_keys.add(key)
    if dirty:
        # drop entries for rewritten/removed files so the cache stays
        # bounded by the live file set
        cache = {k: v for k, v in cache.items() if k in seen_keys}
        os.makedirs(lake_dir, exist_ok=True)
        tmp = cache_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(cache, fh)
        os.replace(tmp, cache_path)
    return out


@ray.remote
def _merge_groups_task(
    merger: Merger, groups: list[pa.Table]
) -> list[dict]:
    """A BATCH of per-partition merges as one raw Ray task — the
    parallel leg of the driver-local tick (exchange='driver' branch).
    Batching ~P/num_cpus merges per task amortizes the per-task
    scheduling cost (~2-3 ms) that dominated a one-task-per-partition
    fan-out at tail-tick scale."""
    rows: list[dict] = []
    for g in groups:
        rows.extend(merger(g).to_pylist())
    return rows


def _write_gen_stats(lake_dir: str, generation: int, entries_ds) -> None:
    """Persist the execution profile beside the lake (observability:
    per-stage wall/cpu/rows — the engine's answer to the reference's
    merge-progress polling, scripts/optimize_db.py:39-42)."""
    try:
        log_dir = os.path.join(lake_dir, "logs")
        os.makedirs(log_dir, exist_ok=True)
        with open(
            os.path.join(log_dir, f"gen-{generation:06d}-stats.txt"), "w"
        ) as fh:
            fh.write(entries_ds.stats())
    except Exception:  # noqa: BLE001 - stats are best-effort
        pass


def replay(stream_dir: str, lake_dir: str, **kw) -> Manifest:
    """Run one replay/tail generation under the lake's single-writer
    lease; see :func:`_replay_impl` for parameters.  A second live
    writer raises ConcurrentWriterError instead of racing the LATEST
    pointer; a crashed writer's lease is taken over automatically."""
    created = acquire_lease(lake_dir)
    try:
        return _replay_impl(stream_dir, lake_dir, **kw)
    finally:
        if created:
            release_lease(lake_dir)


#: wall seconds per phase of the LAST replay in this process —
#: planning (manifest load, file pruning, stage build), spool (the
#: map-side write execution), merge (reduce execution + lineage
#: collection), commit (manifest publish + splits).  Written for the
#: scaling work: fixed cost here dilutes the high-parallelism leg 4x
#: harder than the low one, so each phase must be visible per run.
LAST_PHASES: dict[str, float] = {}


def _replay_impl(
    stream_dir: str,
    lake_dir: str,
    *,
    num_partitions: int | str = DEFAULT_NUM_PARTITIONS,
    batch_size: int = 8192,
    merge_concurrency: int | None = None,
    merge_compute: str = "tasks",
    salt_buckets: int = 0,
    salt_hot_pids: frozenset[int] | str | None = "auto",
    spec: TableSpec = REPO_FILES,
    upto_seq: int | None = None,
    force_repair_pids: frozenset[int] = frozenset(),
    exchange: str = "auto",
    split_threshold_rows: int | None = DEFAULT_SPLIT_THRESHOLD_ROWS,
) -> Manifest:
    """Run one replay/tail generation; returns the committed manifest.

    First call = full backfill (reference ``init``); subsequent calls =
    incremental tick past the stored watermark (reference ``sync``),
    including rollback repair for newly-seen orphan ranges.

    ``exchange``: "spool" (partitioned external shuffle — large
    backfills), "groupby" (one streaming execution — small ticks),
    "driver" (whole tick in-process, merges fused/serial/raw-task by
    prior size — the push-tail latency leg), or "auto" (pick by pruned
    input + prior-lake size).  All legs are semantically identical —
    asserted down to per-partition lineage counters in
    tests/test_replay.py.
    """
    import time as _time

    _t0 = _time.perf_counter()
    LAST_PHASES.clear()
    files = event_files(stream_dir)
    if not files:
        raise FileNotFoundError(f"no events-*.parquet under {stream_dir}")
    if num_partitions == "auto":
        num_partitions = auto_partitions(files)
        prior_gen = load_latest(lake_dir)
        if prior_gen is not None:
            # an existing lake pins the layout — changing P forces a
            # full rebuild, so "auto" defers to the committed choice
            num_partitions = prior_gen.num_partitions
    ranges = [
        (lo, hi)
        for lo, hi in load_rollback_ranges(stream_dir)
        if upto_seq is None or lo <= upto_seq
    ]

    prior = load_latest(lake_dir)
    generation = 0 if prior is None else prior.generation + 1
    watermark = prior.min_watermark if prior else -1
    prior_rb = (
        {tuple(r) for r in prior.applied_rollbacks} if prior else set()
    )
    new_ranges = [r for r in ranges if tuple(r) not in prior_rb]
    # hot-partition split layout carries from the prior generation; a
    # repartition (new P) starts a fresh unsplit layout
    split_depths: dict[int, int] = dict(prior.split_depths) if prior else {}
    if prior is not None and prior.num_partitions != num_partitions:
        split_depths = {}
    repair_pids = _expand_repair_pids(
        force_repair_pids, num_partitions, split_depths
    )
    if prior is not None:
        repair_pids = repair_pids | _find_repair_pids(
            lake_dir, prior, new_ranges, spec.order_col
        )
        if prior.num_partitions != num_partitions:
            # repartitioning the lake = rebuild everything from history
            repair_pids = frozenset(range(num_partitions))

    # --- read: prune whole files, then row groups, via commit_seq ----------
    if watermark >= 0 and not repair_pids:
        # tail tick: skip event files fully applied already (footer-stat
        # cache → only NEW files' footers are opened)
        ranges_by_file = _file_seq_ranges(files, lake_dir, spec.order_col)
        files = [f for f in files if ranges_by_file[f][1] > watermark]
        if not files:
            # nothing new: republish the prior state as a new generation
            manifest = Manifest(
                generation=generation,
                num_partitions=num_partitions,
                partitions=dict(prior.partitions),
                applied_rollbacks=sorted([list(r) for r in ranges]),
                schema_version=prior.schema_version,
                parent_generation=prior.generation,
                split_depths=split_depths,
            )
            commit_manifest(lake_dir, manifest)
            return manifest
    expr = None
    if watermark >= 0 and not repair_pids:
        expr = pc.field(spec.order_col) > watermark
    if upto_seq is not None:
        e = pc.field(spec.order_col) <= upto_seq
        expr = e if expr is None else (expr & e)
    read_kwargs = {"filter": expr} if expr is not None else {}
    # Files arrive in multiple schema versions (v1/v2/v3 — FIXTURES.md §3).
    # One read task per file keeps every block schema-homogeneous (Ray's
    # batcher would otherwise try to concat mixed-schema blocks), and the
    # fused normalize+partial stage runs per block (batch_size=None) so
    # unification happens before any cross-block coalescing.  One file =
    # one task is also the natural granularity at lake scale.
    if salt_hot_pids == "auto":
        # adaptive hot-partition detection: last generation's per-
        # partition event traffic (lineage) flags the hot set for this
        # tick's salting; first generation has no signal → no salting
        salt_hot_pids = frozenset()
        if prior is not None and salt_buckets:
            traffic = {
                pid: e.last_gen_events for pid, e in prior.partitions.items()
            }
            vals = sorted(traffic.values())
            if vals and vals[-1] > 0:
                median = vals[len(vals) // 2]
                salt_hot_pids = frozenset(
                    pid for pid, v in traffic.items() if v > max(1, 4 * median)
                )
    from .purge import load_purge_list

    normalize = Normalize(
        num_partitions, ranges, spec, split_depths=split_depths,
        purge=load_purge_list(lake_dir, spec),
    )
    valid_pids = extended_pids(num_partitions, split_depths)
    # Exact per-PARTITION watermark routing on resumed ticks: the read
    # filter prunes at the global MIN watermark, so partitions whose own
    # watermark is ahead would see already-applied events again.  For
    # LWW that re-delivery is merely wasted work (idempotent fold, but
    # inflated superseded counters); for additive tables (spec.sum_cols)
    # it would DOUBLE-COUNT — so each row is kept only if it is past its
    # own partition's committed watermark.  Repair partitions keep full
    # history (they rebuild from scratch).  Extended (split) partition
    # ids are sparse in [0, P << max_depth), so the lookup is a
    # searchsorted over the sorted valid-id array, not a dense vector.
    wm_ids = wm_arr = None
    if prior is not None and prior.num_partitions == num_partitions:
        wm_ids = np.asarray(valid_pids, dtype=np.int64)
        wm_arr = np.full(len(wm_ids), -1, dtype=np.int64)
        pos = {int(p): i for i, p in enumerate(wm_ids)}
        for _pid, _e in prior.partitions.items():
            i = pos.get(int(_pid))
            if i is not None:
                wm_arr[i] = _e.watermark_seq
    repair_np = np.array(sorted(repair_pids), dtype=np.int64) if repair_pids else None

    def norm_partial(t):
        t = normalize(t)
        if wm_ids is not None and t.num_rows:
            seqs = t.column(spec.order_col).to_numpy(zero_copy_only=False)
            pids = t.column("part_id").to_numpy(zero_copy_only=False)
            keep = seqs > wm_arr[np.searchsorted(wm_ids, pids)]
            if repair_np is not None:
                keep |= np.isin(pids, repair_np)
            if not keep.all():
                t = t.filter(pa.array(keep))
        t = partial_lww(t, spec)
        if salt_buckets:
            # salt-based skew splitting (BASELINE.json): a hot
            # partition's spool fans out over salt=K subdirs, and the
            # merge folds shard-by-shard with O(winners + shard) memory.
            # Only the flagged-hot partitions pay the file fan-out
            # (salt_hot_pids=None salts everything — e.g. uniform-heavy
            # workloads or tests).
            seqs = t.column(spec.order_col).to_numpy(zero_copy_only=False)
            salt = (seqs % salt_buckets).astype("int32")
            if salt_hot_pids is not None:
                pids = t.column("part_id").to_numpy(zero_copy_only=False)
                import numpy as _np

                hot = _np.isin(pids, list(salt_hot_pids))
                salt = _np.where(hot, salt, 0).astype("int32")
            t = t.append_column("salt", pa.array(salt))
        return t

    # Hand-rolled per-file read fused INTO the normalize stage (one
    # task opens its own footer, prunes row groups by the watermark
    # filter, normalizes and partial-folds in place).  Equivalent to
    # ray.data.read_parquet(override_num_blocks=len(files)) + a
    # map_batches, minus read_parquet's driver-side fixed cost — the
    # serial ParquetDataset open, the metadata-prefetch task wave and
    # the encoding-ratio sampling read cost a measured 2-3 s per job
    # regardless of input size, which dilutes the high-parallelism leg
    # of the scaling rule 4x harder than the low one.  Footer work here
    # is per-task, so it parallelizes with the cluster instead of
    # serializing on the driver.
    _filter_expr = read_kwargs.get("filter")
    refold_keys = tuple(spec.key) + ("part_id",)

    def _refold(t: pa.Table) -> pa.Table:
        return fold_lww(t, "n_events", refold_keys, spec.order_col,
                        **agg_kwargs(spec))

    def read_norm_partial(t: pa.Table):
        # STREAM each file through the fold in scanner-batch chunks
        # (one-table-per-file output blocks collapse under object-store
        # memory pressure — measured 3x slower end-to-end), and run the
        # second-level combiner INLINE on an ~256k-row accumulator of
        # winner chunks.  Inline beats a separate map_batches(second_
        # fold, batch_size=256k) stage decisively: Ray's batcher re-
        # concatenates the string-heavy remainder once per incoming
        # chunk to cut exact-size batches (quadratic payload copying —
        # measured 80 s of an old 92 s run at 50M events), while this
        # accumulator concats each winner chunk exactly once.
        from ..stages.merge import _trace_node

        _trace_node("map")
        buf: list[pa.Table] = []
        nbuf = 0
        for path in t.column("path").to_pylist():
            scanner = pads.dataset(path).scanner(
                filter=_filter_expr, batch_size=128 * 1024
            )
            for rb in scanner.to_batches():
                if not rb.num_rows:
                    continue
                w = norm_partial(pa.Table.from_batches([rb]))
                buf.append(w)
                nbuf += w.num_rows
                if nbuf >= (1 << 18):
                    yield _refold(pa.concat_tables(buf))
                    buf, nbuf = [], 0
        if buf:
            yield _refold(pa.concat_tables(buf))

    ds = ray.data.from_items(
        [{"path": f} for f in files], override_num_blocks=len(files)
    ).map_batches(
        read_norm_partial,
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )
    # (the second-level combiner lives INLINE in read_norm_partial's
    # accumulator above: part_id joins the refold key so per-partition
    # orphan-counter rows never collapse across partitions; for real
    # rows part_id is a function of the key, so fold semantics are
    # unchanged.  At 50M events the combined spool is ~0.7M rows.)
    input_bytes = sum(os.path.getsize(f) for f in files)

    prior_files = {
        pid: (os.path.join(lake_dir, e.file) if e.file else None)
        for pid, e in (prior.partitions.items() if prior else ())
    }
    prior_entries = {
        pid: {
            "watermark_seq": e.watermark_seq,
            "events_applied": e.events_applied,
            "events_superseded": e.events_superseded,
            "events_rolled_back": e.events_rolled_back,
            "schema_version": e.schema_version,
        }
        for pid, e in (prior.partitions.items() if prior else ())
    }

    # --- exchange: partitioned spool instead of an object-store sort ---
    # The combined rows (with their wide content payloads) are written
    # once as hive-partitioned Parquet (part_id=N/...), then P merge
    # units each read exactly their partition's files.  Against Ray's
    # sort-based groupby this measured ~3x faster here and scales
    # cleanly: the map side is an append-only compressed spill, the
    # reduce side is embarrassingly parallel, and on a multi-node
    # cluster the spool lives on the lake's shared storage (the classic
    # external shuffle).  Crash-safe: the spool is scratch under the
    # uncommitted generation — reruns remove and rewrite it.
    # --- exchange + merge ---------------------------------------------
    # DEFAULT: partitioned-spool external shuffle (write once as
    # hive-partitioned lz4 Parquet, P merge units read exactly their
    # partition).  Measured repeatedly against Ray's sort-based
    # groupby exchange at 50M events: the spool wins ~3x (the sort
    # path's all-to-all barrier over the fused read→normalize→combine
    # stage serializes poorly), and on a multi-node cluster the spool
    # doubles as the spill-to-shared-storage exchange.  The groupby
    # path (exchange="groupby": one streaming execution, no disk
    # round-trip, ~2s less fixed glue) remains for small incremental
    # ticks where the delta is tiny.
    import shutil

    LAST_PHASES["plan"] = _time.perf_counter() - _t0
    entries_rows: list[dict] = []
    if exchange == "auto":
        # small pruned inputs (fresh tail ticks, small backfills) win
        # from the single streaming execution (~0.5s less fixed glue);
        # large backfills win ~3x from the spool.  `files` is already
        # watermark-pruned, so a tiny tick over a huge lake still
        # picks groupby.  TINY incremental ticks (a freshly landed head
        # segment) skip Ray entirely: even the single groupby execution
        # pays ~0.3 s of task-scheduling fixed cost, which dominated the
        # tail-latency soak's p50 (VERDICT r04 Next #5) — the driver
        # path below runs the SAME norm_partial→refold→Merger code
        # in-process, so a watch-mode tick commits in tens of ms.
        if (
            prior is not None
            and not salt_buckets
            and merge_compute == "tasks"
            and input_bytes
            < int(os.environ.get("W3R_DRIVER_TICK_BYTES", 32 << 20))
        ):
            exchange = "driver"
        else:
            exchange = "groupby" if input_bytes < (512 << 20) else "spool"
    use_driver = (
        exchange == "driver"
        and not salt_buckets
        and merge_compute == "tasks"
    )
    use_spool = not use_driver and (
        exchange != "groupby"
        or bool(salt_buckets)
        or (merge_compute == "actors")
    )
    if use_driver:
        # Driver-local tick: identical pipeline, zero Ray executions.
        # Correctness-equivalent by construction — the exact same
        # closures the distributed path maps over blocks run here over
        # the same scanner batches, and the same Merger folds each
        # partition group.
        merger = Merger(
            lake_dir, generation, prior_files, prior_entries, repair_pids, spec
        )
        winners: list[pa.Table] = []
        buf: list[pa.Table] = []
        nbuf = 0
        for path in files:
            scanner = pads.dataset(path).scanner(
                filter=_filter_expr, batch_size=128 * 1024
            )
            for rb in scanner.to_batches():
                if not rb.num_rows:
                    continue
                w = norm_partial(pa.Table.from_batches([rb]))
                buf.append(w)
                nbuf += w.num_rows
                if nbuf >= (1 << 18):
                    # unlike the one-file-per-task Ray path, this loop
                    # mixes schema versions in one buffer — promote
                    # unifies the nullability deltas
                    winners.append(
                        _refold(
                            pa.concat_tables(
                                buf, promote_options="default"
                            )
                        )
                    )
                    buf, nbuf = [], 0
        if buf:
            winners.append(
                _refold(pa.concat_tables(buf, promote_options="default"))
            )
        folded = (
            _refold(
                pa.concat_tables(winners, promote_options="default")
            )
            if winners
            else None
        )
        LAST_PHASES["fold"] = (
            _time.perf_counter() - _t0 - sum(LAST_PHASES.values())
        )
        if folded is not None and folded.num_rows:
            folded = folded.sort_by("part_id")
            pids_np = folded.column("part_id").to_numpy(
                zero_copy_only=False
            )
            starts = np.concatenate(
                [[0], np.flatnonzero(np.diff(pids_np)) + 1, [len(pids_np)]]
            )
            groups = [
                folded.slice(starts[i], starts[i + 1] - starts[i])
                for i in range(len(starts) - 1)
            ]
            # Three ways to run the P merges, by prior-lake size:
            # (1) FUSED: total prior bytes of the touched partitions is
            #     tiny → one read + one fold + P slice-writes
            #     (fused_tiny_merge) — removes the ~5 ms × P fixed
            #     pyarrow cost that dominated push-tail latency;
            # (2) RAW RAY TASKS: lake big enough that the rewrite work
            #     itself matters → batch the merges over ~num_cpus
            #     tasks (scheduling ~10 ms total, far under a Ray Data
            #     execution's fixed cost);
            # (3) SERIAL: in between / no Ray — plain loop (measured
            #     faster than a thread pool: merges are bursts of small
            #     GIL-holding pyarrow calls).
            touched = {
                int(pids_np[s]) for s in starts[:-1]
            }
            prior_bytes = 0
            for pid in touched:
                f = prior_files.get(pid)
                if f and pid not in repair_pids:
                    try:
                        prior_bytes += os.path.getsize(f)
                    except OSError:
                        pass
            prior_rows = sum(
                e.num_rows for e in prior.partitions.values()
            ) if prior is not None else 0
            if prior_bytes + input_bytes < int(
                os.environ.get("W3R_FUSED_MERGE_BYTES", 16 << 20)
            ):
                from ..stages.merge import fused_tiny_merge

                entries_rows.extend(fused_tiny_merge(merger, folded))
            elif prior_rows >= int(
                os.environ.get("W3R_DRIVER_REMOTE_ROWS", 100_000)
            ) and ray.is_initialized():
                cpus = int(ray.cluster_resources().get("CPU", 4))
                n_tasks = max(1, min(len(groups), cpus))
                buckets: list[list[pa.Table]] = [
                    [] for _ in range(n_tasks)
                ]
                for i, g in enumerate(groups):
                    buckets[i % n_tasks].append(g)
                mref = ray.put(merger)
                futures = [
                    _merge_groups_task.remote(mref, b)
                    for b in buckets
                    if b
                ]
                for rows in ray.get(futures):
                    entries_rows.extend(rows)
            else:
                for g in groups:
                    entries_rows.extend(merger(g).to_pylist())
        seen_pids = {int(r["part_id"]) for r in entries_rows}
        for pid in sorted(set(repair_pids) - seen_pids):
            entries_rows.extend(
                merger.merge(pid, _empty_group(spec)).to_pylist()
            )
    elif not use_spool:
        merger = Merger(
            lake_dir, generation, prior_files, prior_entries, repair_pids, spec
        )

        def merge_group(group, _m=merger):
            return _m(group)

        entries_ds = ds.groupby("part_id").map_groups(
            merge_group, batch_format="pyarrow"
        )
        # P small lineage rows — the only driver-side materialization
        entries_rows = entries_ds.take_all()
        # repair pids with NO routed rows (empty partitions being
        # rebuilt) never form a group — finalize them inline so their
        # stale prior file is dropped from the manifest
        seen_pids = {int(r["part_id"]) for r in entries_rows}
        for pid in sorted(set(repair_pids) - seen_pids):
            entries_rows.extend(
                merger.merge(pid, _empty_group(spec)).to_pylist()
            )
        _write_gen_stats(lake_dir, generation, entries_ds)
    else:
        spool_dir = os.path.join(lake_dir, "_shuffle", f"gen={generation:06d}")
        shutil.rmtree(spool_dir, ignore_errors=True)
        spool_cols = ["part_id", "salt"] if salt_buckets else ["part_id"]
        # lz4 codec: merge workers decode the spool single-threaded
        # (OMP_NUM_THREADS=1); snappy decode of the content column
        # dominated merge CPU before (measured 6.4s of a 9s unit)
        ds.write_parquet(spool_dir, partition_cols=spool_cols, compression="lz4")
        LAST_PHASES["spool"] = (
            _time.perf_counter() - _t0 - sum(LAST_PHASES.values())
        )

        try:
            spooled_pids = sorted(
                int(d.split("=")[1])
                for d in os.listdir(spool_dir)
                if d.startswith("part_id=")
            )
        except FileNotFoundError:
            spooled_pids = []
        merge_pids = sorted(set(spooled_pids) | set(repair_pids))

        if merge_pids:
            merger_args = (
                spool_dir,
                lake_dir,
                generation,
                prior_files,
                prior_entries,
                repair_pids,
                spec,
            )
            # one block per pid directly — a .repartition() here would
            # add a whole extra (tiny) Ray execution to every tick
            pid_ds = ray.data.from_items(
                [{"pid": p} for p in merge_pids],
                override_num_blocks=len(merge_pids),
            )
            if merge_compute == "actors":
                if merge_concurrency is None:
                    # leave headroom: a pool reserving every CPU starves
                    # the rest of the pipeline
                    cpus = int(ray.cluster_resources().get("CPU", 4))
                    merge_concurrency = max(1, min(len(merge_pids), cpus // 2))
                entries_ds = pid_ds.map_batches(
                    SpoolMerger,
                    fn_constructor_args=merger_args,
                    batch_format="pyarrow",
                    batch_size=None,
                    concurrency=merge_concurrency,
                )
            else:
                merger = SpoolMerger(*merger_args)

                def merge_fn(batch, _m=merger):
                    return _m(batch)

                entries_ds = pid_ds.map_batches(
                    merge_fn, batch_format="pyarrow", batch_size=None
                )
            entries_rows = entries_ds.take_all()
            _write_gen_stats(lake_dir, generation, entries_ds)
        shutil.rmtree(spool_dir, ignore_errors=True)
    rows = entries_rows
    LAST_PHASES["merge"] = _time.perf_counter() - _t0 - sum(LAST_PHASES.values())

    partitions: dict[int, PartitionEntry] = {}
    for r in rows:
        partitions[int(r["part_id"])] = PartitionEntry(
            part_id=int(r["part_id"]),
            file=r["file"],
            num_rows=int(r["num_rows"]),
            watermark_seq=int(r["watermark_seq"]),
            events_applied=int(r["events_applied"]),
            events_superseded=int(r["events_superseded"]),
            events_rolled_back=int(r["events_rolled_back"]),
            schema_version=int(r["schema_version"]),
            last_gen_events=int(r.get("last_gen_events", 0)),
        )
    # carry forward untouched partitions from the prior generation —
    # only under an unchanged layout (a repartition rebuilt every new
    # pid; stale old-layout ids must not leak into the new manifest)
    if prior is not None and prior.num_partitions == num_partitions:
        valid_set = set(valid_pids)
        for pid, e in prior.partitions.items():
            if pid not in partitions and pid in valid_set:
                partitions[pid] = e
    # ensure every (extended) partition id exists (empty lake partitions)
    global_wm = max(
        [p.watermark_seq for p in partitions.values()] + [watermark, -1]
    )
    for pid in valid_pids:
        if pid not in partitions:
            partitions[pid] = PartitionEntry(
                part_id=pid, file=None, watermark_seq=global_wm
            )

    manifest = Manifest(
        generation=generation,
        num_partitions=num_partitions,
        partitions=partitions,
        applied_rollbacks=sorted([list(r) for r in ranges]),
        schema_version=max(p.schema_version for p in partitions.values()),
        parent_generation=None if prior is None else prior.generation,
        split_depths=split_depths,
    )
    commit_manifest(lake_dir, manifest)
    # growth-adaptive layout: partitions past the split threshold double
    # their file count (one extra committed generation per doubling;
    # only the oversized partitions rewrite — see split_partitions)
    while split_threshold_rows:
        over = sorted(
            {
                int(pid) % num_partitions
                for pid, e in manifest.partitions.items()
                if e.num_rows > split_threshold_rows
                and manifest.depth_of(int(pid) % num_partitions) < MAX_SPLIT_DEPTH
            }
        )
        if not over:
            break
        manifest = split_partitions(lake_dir, over, spec=spec)
    LAST_PHASES["commit"] = _time.perf_counter() - _t0 - sum(LAST_PHASES.values())
    return manifest


def _run_split_items(
    data_root: str,
    generation: int,
    P: int,
    key_cols: list[str],
    items: list[dict],
) -> list[dict]:
    """Distributed file-split worker shared by the single-table and
    fan-out split ops: one Ray task batch per work item streams the
    parent file row-group-by-row-group into two child writers routed
    by the next depth's sub-hash (memory O(row group)); returns one
    lineage entry row per child."""
    from ..functions.hashing import key_hash64

    if not items:
        return []

    def split_file(batch: pa.Table) -> pa.Table:
        out: list[pa.Table] = []
        for row in batch.to_pylist():  # ≤ a handful of work items/task
            src = os.path.join(data_root, row["file"])
            pf = pq.ParquetFile(src)
            width = np.uint64(P) << np.uint64(row["k"] + 1)
            writers: dict[str, pq.ParquetWriter | None] = {"lo": None, "hi": None}
            rows = {"lo": 0, "hi": 0}
            paths = {
                side: os.path.join(
                    data_root, partition_relpath(generation, row[side])
                )
                for side in ("lo", "hi")
            }

            def emit(side: str, t: pa.Table) -> None:
                if not t.num_rows:
                    return
                if writers[side] is None:
                    os.makedirs(os.path.dirname(paths[side]), exist_ok=True)
                    writers[side] = pq.ParquetWriter(paths[side], t.schema)
                writers[side].write_table(t)
                rows[side] += t.num_rows

            for i in range(pf.num_row_groups):
                rg = pf.read_row_group(i)
                h = key_hash64(*[rg.column(c) for c in key_cols])
                sub_next = ((h % width) // np.uint64(P)).astype(np.int64)
                hi_mask = sub_next != int(row["sub"])
                emit("hi", rg.filter(pa.array(hi_mask)))
                emit("lo", rg.filter(pa.array(~hi_mask)))
            for side in ("lo", "hi"):
                if writers[side] is not None:
                    writers[side].close()
            for side, keep_ctr in (("lo", True), ("hi", False)):
                out.append(
                    pa.table(
                        {
                            "part_id": [int(row[side])],
                            "file": [
                                partition_relpath(generation, row[side])
                                if rows[side]
                                else None
                            ],
                            "num_rows": [rows[side]],
                            "watermark_seq": [int(row["watermark_seq"])],
                            "events_applied": [
                                int(row["events_applied"]) if keep_ctr else 0
                            ],
                            "events_superseded": [
                                int(row["events_superseded"]) if keep_ctr else 0
                            ],
                            "events_rolled_back": [
                                int(row["events_rolled_back"]) if keep_ctr else 0
                            ],
                            "schema_version": [int(row["schema_version"])],
                            "last_gen_events": [0],
                        },
                        schema=ENTRY_SCHEMA,
                    )
                )
        return pa.concat_tables(out) if out else ENTRY_SCHEMA.empty_table()

    return (
        ray.data.from_items(items)
        .repartition(len(items))
        .map_batches(split_file, batch_format="pyarrow", batch_size=None)
        .take_all()
    )


def plan_split_items(
    prior_partitions: dict[int, PartitionEntry],
    P: int,
    depths: dict[int, int],
    bases: list[int],
    partitions_out: dict[int, PartitionEntry],
) -> list[dict]:
    """Shared split planning: raise each base's depth in ``depths``,
    collect file-split work items, and place empty-parent children
    directly into ``partitions_out``."""
    items: list[dict] = []
    for b in sorted({int(x) for x in bases}):
        if not (0 <= b < P):
            raise ValueError(f"base pid {b} outside [0, {P})")
        k = int(depths.get(b, 0))
        if k >= MAX_SPLIT_DEPTH:
            continue
        for s in range(1 << k):
            lo = b + P * s
            hi = b + P * (s + (1 << k))
            entry = prior_partitions.get(lo) or PartitionEntry(
                part_id=lo, file=None
            )
            if entry.file:
                items.append(
                    {
                        "lo": lo,
                        "hi": hi,
                        "sub": s,
                        "k": k,
                        "file": entry.file,
                        "watermark_seq": entry.watermark_seq,
                        "events_applied": entry.events_applied,
                        "events_superseded": entry.events_superseded,
                        "events_rolled_back": entry.events_rolled_back,
                        "schema_version": entry.schema_version,
                    }
                )
            else:
                # empty parent → two empty children, watermark carried
                for pid in (lo, hi):
                    partitions_out[pid] = PartitionEntry(
                        part_id=pid,
                        file=None,
                        watermark_seq=entry.watermark_seq,
                        events_applied=entry.events_applied if pid == lo else 0,
                        events_superseded=(
                            entry.events_superseded if pid == lo else 0
                        ),
                        events_rolled_back=(
                            entry.events_rolled_back if pid == lo else 0
                        ),
                        schema_version=entry.schema_version,
                    )
        depths[b] = k + 1
    return items


def split_partitions(
    lake_dir: str,
    bases: list[int],
    *,
    spec: TableSpec = REPO_FILES,
) -> Manifest:
    """Split the given BASE partitions one depth level (2^k → 2^(k+1)
    files each) and commit the result as a new generation.  Runs under
    the writer lease (reentrant when auto-triggered from replay).

    Scale contract (SURVEY §7.5(6) / VERDICT r02 Wrong #3): ONLY the
    split bases' files are rewritten — every other partition is carried
    forward untouched, so splitting one overgrown partition of a
    petabyte lake moves exactly that partition's bytes.  Each file
    splits in ONE streaming pass: row groups are read one at a time and
    routed to two ParquetWriters by the next depth's sub-hash, so task
    memory is O(row group), and because the parent file is key-sorted a
    filtered child stays key-sorted (merge-on-write invariant holds).

    Lineage: both children inherit the parent's watermark (they cover
    disjoint key subsets of exactly the applied history); cumulative
    event counters stay on the low child so lake totals don't double.
    """
    from ..functions.hashing import key_hash64

    created = acquire_lease(lake_dir)
    try:
        return _split_partitions_locked(lake_dir, bases, spec)
    finally:
        if created:
            release_lease(lake_dir)


def _split_partitions_locked(
    lake_dir: str, bases: list[int], spec: TableSpec
) -> Manifest:
    from ..functions.hashing import key_hash64

    prior = load_latest(lake_dir)
    if prior is None:
        raise FileNotFoundError(f"no committed lake under {lake_dir}")
    P = prior.num_partitions
    depths = dict(prior.split_depths)
    generation = prior.generation + 1
    key_cols = list(spec.key)

    partitions = dict(prior.partitions)
    items = plan_split_items(prior.partitions, P, depths, bases, partitions)

    for r in _run_split_items(lake_dir, generation, P, key_cols, items):
        partitions[int(r["part_id"])] = PartitionEntry(
            part_id=int(r["part_id"]),
            file=r["file"],
            num_rows=int(r["num_rows"]),
            watermark_seq=int(r["watermark_seq"]),
            events_applied=int(r["events_applied"]),
            events_superseded=int(r["events_superseded"]),
            events_rolled_back=int(r["events_rolled_back"]),
            schema_version=int(r["schema_version"]),
            last_gen_events=0,
        )

    manifest = Manifest(
        generation=generation,
        num_partitions=P,
        partitions=partitions,
        applied_rollbacks=list(prior.applied_rollbacks),
        schema_version=prior.schema_version,
        parent_generation=prior.generation,
        split_depths=depths,
    )
    commit_manifest(lake_dir, manifest)
    return manifest


def _manifest_at(lake_dir: str, generation: int | None) -> Manifest:
    """LATEST, or a time-travel generation — which must be on the
    committed parent chain: a manifest file staged by a crashed writer
    (never published by the LATEST swap) is as invisible to time
    travel as it is to normal reads."""
    latest = load_latest(lake_dir)
    if latest is None:
        raise FileNotFoundError(f"no committed manifest under {lake_dir}")
    if generation is None or generation == latest.generation:
        return latest
    if generation not in committed_chain(lake_dir) and generation not in set(
        list_tags(lake_dir).values()
    ):
        # a TAGGED generation stays readable even after GC removed the
        # chain links past it — its membership was checked at tag time
        raise ValueError(
            f"generation {generation} is not on the committed chain of "
            f"{lake_dir} and is not tagged (staged-only, GC'd, or never "
            f"existed)"
        )
    return load_manifest(lake_dir, generation)


def read_lake(
    lake_dir: str,
    columns: list[str] | None = None,
    *,
    generation: int | None = None,
    tag: str | None = None,
) -> ray.data.Dataset:
    """Dataset over a committed lake state (manifest-listed files only
    — staged/orphaned files are invisible).  ``generation`` time-travels
    to any snapshot still on the committed chain (bounded by
    ``gc_generations`` retention); ``tag`` reads a pinned snapshot by
    name (``create_tag``) — pinned generations outlive GC."""
    if tag is not None:
        if generation is not None:
            raise ValueError("pass generation= or tag=, not both")
        generation = resolve_tag(lake_dir, tag)
    manifest = _manifest_at(lake_dir, generation)
    files = manifest.data_files(lake_dir)
    if not files:
        return ray.data.from_items([])
    kwargs = {"columns": columns} if columns else {}
    return ray.data.read_parquet(files, **kwargs)


def lake_diff(
    lake_dir: str,
    gen_old: int,
    gen_new: int | None = None,
    *,
    spec: TableSpec = REPO_FILES,
) -> ray.data.Dataset:
    """Distributed snapshot diff between two committed generations:
    one row per upsert key whose state changed, with columns
    key_cols... + (change ∈ added|deleted|updated, old_seq, new_seq).

    Scale shape: both snapshots share the lake's hash partitioning, so
    the diff is partition-aligned — one task per partition id reads the
    two partition files and compares vectorized (index_in on the
    composite key).  NO shuffle: at 10^10 keys this moves zero rows
    between workers and touches only partitions whose file actually
    differs between the generations (identical carried-forward files
    are skipped entirely)."""
    m_old = _manifest_at(lake_dir, gen_old)
    m_new = _manifest_at(lake_dir, gen_new)
    if m_old.num_partitions != m_new.num_partitions:
        raise ValueError(
            "snapshot diff across a repartitioned lake is not partition-"
            f"aligned ({m_old.num_partitions} vs {m_new.num_partitions}); "
            "re-key with a replay at the new partition count first"
        )
    if m_old.split_depths != m_new.split_depths:
        raise ValueError(
            "snapshot diff across a partition split is not partition-"
            "aligned; diff generations on the same split layout"
        )
    pairs = []
    for pid in m_new.extended_pids():
        fo = m_old.partitions.get(pid)
        fn = m_new.partitions.get(pid)
        fo = fo.file if fo else None
        fn = fn.file if fn else None
        if fo == fn:
            continue  # untouched partition carried forward — no diff
        pairs.append({"part_id": pid, "old_file": fo, "new_file": fn})
    key_cols, order_col = list(spec.key), spec.order_col
    key_types = [spec.schema.field(c).type for c in key_cols]

    def diff_partition(batch: pa.Table) -> pa.Table:
        out = []
        cols = key_cols + [order_col]
        for row in batch.to_pylist():
            old_t = (
                pq.read_table(os.path.join(lake_dir, row["old_file"]), columns=cols)
                if row["old_file"]
                else None
            )
            new_t = (
                pq.read_table(os.path.join(lake_dir, row["new_file"]), columns=cols)
                if row["new_file"]
                else None
            )

            def ckey(t: pa.Table) -> pa.Array:
                parts = [t.column(c).cast(pa.string()) for c in key_cols]
                return pc.binary_join_element_wise(*parts, "\x00")

            empty = pa.table(
                {c: pa.array([], spec.schema.field(c).type) for c in cols}
            )
            old_t = old_t if old_t is not None else empty
            new_t = new_t if new_t is not None else empty
            ko, kn = ckey(old_t), ckey(new_t)
            idx_on = pc.index_in(ko, kn)  # old key's position in new
            idx_no = pc.index_in(kn, ko)  # new key's position in old
            # deleted: in old, not in new
            del_mask = pc.is_null(idx_on)
            deleted = old_t.filter(del_mask)
            # added: in new, not in old
            add_mask = pc.is_null(idx_no)
            added = new_t.filter(add_mask)
            # updated: in both, order col differs
            both = new_t.filter(pc.is_valid(idx_no))
            old_seq_for_new = pc.take(
                old_t.column(order_col), idx_no.filter(pc.is_valid(idx_no))
            )
            upd_mask = pc.not_equal(both.column(order_col), old_seq_for_new)
            updated = both.filter(upd_mask)
            upd_old_seq = old_seq_for_new.filter(upd_mask)

            def emit(t: pa.Table, change: str, old_seq, new_seq):
                d = {c: t.column(c) for c in key_cols}
                d["change"] = pa.array([change] * t.num_rows, pa.string())
                d["old_seq"] = old_seq
                d["new_seq"] = new_seq
                out.append(pa.table(d))

            nulls = lambda n: pa.nulls(n, pa.int64())  # noqa: E731
            emit(deleted, "deleted", deleted.column(order_col).cast(pa.int64()),
                 nulls(deleted.num_rows))
            emit(added, "added", nulls(added.num_rows),
                 added.column(order_col).cast(pa.int64()))
            emit(updated, "updated", upd_old_seq.cast(pa.int64()),
                 updated.column(order_col).cast(pa.int64()))
        if not out:
            schema = pa.schema(
                [(c, t) for c, t in zip(key_cols, key_types)]
                + [("change", pa.string()), ("old_seq", pa.int64()),
                   ("new_seq", pa.int64())]
            )
            return schema.empty_table()
        return pa.concat_tables(out)

    if not pairs:
        return ray.data.from_items([]).map_batches(
            diff_partition, batch_format="pyarrow"
        )
    return ray.data.from_items(pairs).map_batches(
        diff_partition, batch_format="pyarrow", batch_size=1
    )


def lakes_diff(
    lake_a: str,
    lake_b: str,
    *,
    generation_a: int | None = None,
    generation_b: int | None = None,
    spec: TableSpec = REPO_FILES,
) -> ray.data.Dataset:
    """Cross-LAKE consistency check: diff the converged states of two
    lakes (source vs replica, primary vs backup restore, two relay
    endpoints).  Same partition-aligned zero-shuffle shape as
    lake_diff — requires both lakes to share the partition layout
    (true for an export→land→replay replica built at the same P), one
    task per differing partition pair, identical content-hash files
    short-circuit without reading rows.  Output: one row per key whose
    winner differs, change ∈ added|deleted|updated (b relative to a),
    old_seq (a) / new_seq (b)."""
    m_a = _manifest_at(lake_a, generation_a)
    m_b = _manifest_at(lake_b, generation_b)
    if (
        m_a.num_partitions != m_b.num_partitions
        or m_a.split_depths != m_b.split_depths
    ):
        raise ValueError(
            "cross-lake diff needs both lakes on the same partition "
            f"layout ({m_a.num_partitions}/{m_a.split_depths} vs "
            f"{m_b.num_partitions}/{m_b.split_depths})"
        )
    pairs = []
    for pid in sorted(set(m_a.extended_pids()) | set(m_b.extended_pids())):
        fa = m_a.partitions.get(pid)
        fb = m_b.partitions.get(pid)
        fa = os.path.join(lake_a, fa.file) if fa and fa.file else None
        fb = os.path.join(lake_b, fb.file) if fb and fb.file else None
        if fa is None and fb is None:
            continue
        if (
            fa is not None
            and fb is not None
            and os.path.getsize(fa) == os.path.getsize(fb)
        ):
            # cheap content short-circuit: identical bytes ⇒ no diff
            import filecmp

            if filecmp.cmp(fa, fb, shallow=False):
                continue
        pairs.append({"part_id": pid, "old_file": fa, "new_file": fb})
    key_cols, order_col = list(spec.key), spec.order_col
    key_types = [spec.schema.field(c).type for c in key_cols]

    def diff_partition(batch: pa.Table) -> pa.Table:
        out = []
        cols = key_cols + [order_col]
        for row in batch.to_pylist():
            old_t = (
                pq.read_table(row["old_file"], columns=cols)
                if row["old_file"]
                else None
            )
            new_t = (
                pq.read_table(row["new_file"], columns=cols)
                if row["new_file"]
                else None
            )

            def ckey(t: pa.Table) -> pa.Array:
                parts = [t.column(c).cast(pa.string()) for c in key_cols]
                return pc.binary_join_element_wise(*parts, "\x00")

            empty = pa.table(
                {c: pa.array([], spec.schema.field(c).type) for c in cols}
            )
            old_t = old_t if old_t is not None else empty
            new_t = new_t if new_t is not None else empty
            ko, kn = ckey(old_t), ckey(new_t)
            idx_no = pc.index_in(kn, ko)
            deleted = old_t.filter(pc.is_null(pc.index_in(ko, kn)))
            added = new_t.filter(pc.is_null(idx_no))
            both = new_t.filter(pc.is_valid(idx_no))
            old_seq_for_new = pc.take(
                old_t.column(order_col), idx_no.filter(pc.is_valid(idx_no))
            )
            upd_mask = pc.not_equal(both.column(order_col), old_seq_for_new)
            updated = both.filter(upd_mask)
            upd_old = old_seq_for_new.filter(upd_mask)

            def emit(t, change, old_seq, new_seq):
                d = {c: t.column(c) for c in key_cols}
                d["change"] = pa.array([change] * t.num_rows, pa.string())
                d["old_seq"] = old_seq
                d["new_seq"] = new_seq
                out.append(pa.table(d))

            nulls = lambda n: pa.nulls(n, pa.int64())  # noqa: E731
            emit(deleted, "deleted",
                 deleted.column(order_col).cast(pa.int64()),
                 nulls(deleted.num_rows))
            emit(added, "added", nulls(added.num_rows),
                 added.column(order_col).cast(pa.int64()))
            emit(updated, "updated", upd_old.cast(pa.int64()),
                 updated.column(order_col).cast(pa.int64()))
        if not out:
            return pa.schema(
                [(c, t) for c, t in zip(key_cols, key_types)]
                + [("change", pa.string()), ("old_seq", pa.int64()),
                   ("new_seq", pa.int64())]
            ).empty_table()
        return pa.concat_tables(out)

    if not pairs:
        return ray.data.from_items([]).map_batches(
            diff_partition, batch_format="pyarrow"
        )
    return ray.data.from_items(pairs).map_batches(
        diff_partition, batch_format="pyarrow", batch_size=1
    )


def lake_changelog(
    lake_dir: str,
    gen_old: int,
    gen_new: int | None = None,
    *,
    spec: TableSpec = REPO_FILES,
) -> ray.data.Dataset:
    """Publish-side CDC: the change feed between two committed
    generations, with full after-images — the outbox half of a CDC
    engine (the reference only consumes CDC; a downstream consumer of
    THIS lake needs the inverse of src/ch_eth/sync.rs's apply loop).

    One row per changed upsert key:
      key_cols... + payload_cols... (after-image; null for deletes)
      + ``op`` ∈ c|u|d (Debezium verbs) + ``old_seq`` + ``seq``.
    ``seq`` is the new winner's order value for c/u and null for d —
    merge drops tombstones, so the deleting event's own seq is not
    retained in lake state (see export_debezium_jsonl for the wire
    substitute).

    Scale shape is lake_diff's: both snapshots share the lake's hash
    partitioning, so the feed is computed partition-aligned — one task
    per changed partition pair, vectorized index_in on the composite
    key, NO shuffle, untouched carried-forward partitions skipped
    entirely.  After-images ride the same partition read (no second
    lookup pass)."""
    m_old = _manifest_at(lake_dir, gen_old)
    m_new = _manifest_at(lake_dir, gen_new)
    return _changelog_from_states(lake_dir, m_old, m_new, spec)


def fanout_changelog(
    lake_dir: str,
    table: str,
    gen_old: int,
    gen_new: int | None = None,
    *,
    spec: TableSpec,
) -> ray.data.Dataset:
    """Change feed for ONE table of a multi-table fan-out lake between
    two committed multi-manifest generations.  Because a single
    multi-manifest pins every table's files together, feeds exported
    for all tables at the same (gen_old, gen_new) are CROSS-TABLE
    CONSISTENT — a downstream consumer applying them sees the same
    atomic cut the lake committed."""
    from ..state.manifest import multi_manifest_at

    m_old = multi_manifest_at(lake_dir, gen_old)
    m_new = multi_manifest_at(lake_dir, gen_new)
    for m in (m_old, m_new):
        if table not in m.tables:
            raise FileNotFoundError(
                f"no committed table {table} at generation {m.generation}"
            )
    # fan-out TableState partition files are relative to the table dir
    return _changelog_from_states(
        os.path.join(lake_dir, "tables", table),
        m_old.tables[table],
        m_new.tables[table],
        spec,
    )


def _changelog_from_states(
    lake_dir: str,
    m_old,
    m_new,
    spec: TableSpec,
) -> ray.data.Dataset:
    """Shared core of lake_changelog / fanout_changelog: any two
    states exposing (num_partitions, split_depths, partitions,
    extended_pids) — a single-table Manifest or a fan-out
    TableState."""
    if (
        m_old.num_partitions != m_new.num_partitions
        or m_old.split_depths != m_new.split_depths
    ):
        raise ValueError(
            "changelog across a repartitioned/split lake is not "
            "partition-aligned; diff generations on the same layout"
        )
    pairs = []
    for pid in m_new.extended_pids():
        fo = m_old.partitions.get(pid)
        fn = m_new.partitions.get(pid)
        fo = fo.file if fo else None
        fn = fn.file if fn else None
        if fo == fn:
            continue  # untouched partition carried forward
        pairs.append({"part_id": pid, "old_file": fo, "new_file": fn})
    key_cols, order_col = list(spec.key), spec.order_col
    payload_cols = [
        f.name for f in spec.schema if f.name not in key_cols and f.name != order_col
    ]
    out_schema = pa.schema(
        [(c, spec.schema.field(c).type) for c in key_cols]
        + [(c, spec.schema.field(c).type) for c in payload_cols]
        + [("op", pa.string()), ("old_seq", pa.int64()), ("seq", pa.int64())]
    )

    def changelog_partition(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            old_t = (
                pq.read_table(
                    os.path.join(lake_dir, row["old_file"]),
                    columns=key_cols + [order_col],
                )
                if row["old_file"]
                else None
            )
            new_t = (
                pq.read_table(os.path.join(lake_dir, row["new_file"]))
                if row["new_file"]
                else None
            )

            def ckey(t: pa.Table) -> pa.Array:
                parts = [t.column(c).cast(pa.string()) for c in key_cols]
                return pc.binary_join_element_wise(*parts, "\x00")

            if old_t is None:
                old_t = pa.schema(
                    [(c, spec.schema.field(c).type) for c in key_cols]
                    + [(order_col, spec.schema.field(order_col).type)]
                ).empty_table()
            if new_t is None:
                new_t = spec.schema.empty_table()
            ko, kn = ckey(old_t), ckey(new_t)
            idx_on = pc.index_in(ko, kn)  # old key's position in new
            idx_no = pc.index_in(kn, ko)  # new key's position in old
            deleted = old_t.filter(pc.is_null(idx_on))
            added = new_t.filter(pc.is_null(idx_no))
            both = new_t.filter(pc.is_valid(idx_no))
            old_seq_for_new = pc.take(
                old_t.column(order_col), idx_no.filter(pc.is_valid(idx_no))
            )
            upd_mask = pc.not_equal(both.column(order_col), old_seq_for_new)
            updated = both.filter(upd_mask)
            upd_old_seq = old_seq_for_new.filter(upd_mask)

            def emit(t: pa.Table, op: str, old_seq, seq):
                n = t.num_rows
                d = {c: t.column(c) for c in key_cols}
                for c in payload_cols:
                    d[c] = (
                        t.column(c)
                        if c in t.column_names and op != "d"
                        else pa.nulls(n, spec.schema.field(c).type)
                    )
                d["op"] = pa.array([op] * n, pa.string())
                d["old_seq"] = old_seq
                d["seq"] = seq
                out.append(pa.table(d))

            nulls = lambda n: pa.nulls(n, pa.int64())  # noqa: E731
            emit(
                deleted, "d",
                deleted.column(order_col).cast(pa.int64()),
                nulls(deleted.num_rows),
            )
            emit(
                added, "c", nulls(added.num_rows),
                added.column(order_col).cast(pa.int64()),
            )
            emit(
                updated, "u", upd_old_seq.cast(pa.int64()),
                updated.column(order_col).cast(pa.int64()),
            )
        if not out:
            return out_schema.empty_table()
        return pa.concat_tables(
            [t.select(out_schema.names) for t in out]
        ).cast(out_schema)

    if not pairs:
        return ray.data.from_items([]).map_batches(
            changelog_partition, batch_format="pyarrow"
        )
    return ray.data.from_items(pairs).map_batches(
        changelog_partition, batch_format="pyarrow", batch_size=1
    )


def lookup_key(
    lake_dir: str, repo: str, path: str, *, generation: int | None = None
) -> dict | None:
    """Point lookup by upsert key — the reference's stored-hash probe
    for one block (src/ch_eth/sync.rs:164-169).  Partition-pruned: the
    key hashes to exactly one partition file, and the Parquet read
    filters by (repo, path) via row-group statistics — O(1) files
    touched regardless of lake size."""
    import numpy as np

    from ..functions.hashing import key_hash64

    try:
        manifest = _manifest_at(lake_dir, generation)
    except FileNotFoundError:
        return None
    pid = int(
        route_pids(
            key_hash64(pa.array([repo]), pa.array([path])),
            manifest.num_partitions,
            depth_vector(manifest.num_partitions, manifest.split_depths),
        )[0]
    )
    entry = manifest.partitions.get(pid)
    if entry is None or not entry.file:
        return None
    t = pq.read_table(
        os.path.join(lake_dir, entry.file),
        filters=[("repo", "=", repo), ("path", "=", path)],
    )
    return t.to_pylist()[0] if t.num_rows else None


def lake_table(
    lake_dir: str, *, generation: int | None = None, tag: str | None = None
):
    """Driver-side pyarrow.Table of the lake (tests / small results only)."""
    if tag is not None:
        if generation is not None:
            raise ValueError("pass generation= or tag=, not both")
        generation = resolve_tag(lake_dir, tag)
    try:
        manifest = _manifest_at(lake_dir, generation)
    except FileNotFoundError:
        manifest = None
    files = manifest.data_files(lake_dir) if manifest else []
    import pyarrow as pa

    from ..schema import LAKE_SCHEMA

    if not files:
        return LAKE_SCHEMA.empty_table()
    return pads.dataset(files).to_table()


def pruned_parquet_scan(
    files: list[str],
    empty_table: pa.Table,
    *,
    predicate: tuple[str, str, object] | None = None,
    columns: list[str] | None = None,
):
    """Predicate-pruned streaming scan over explicit parquet files:
    before any task is scheduled, candidate files are pruned by their
    Parquet FOOTER row-group statistics for the predicate column (the
    zone-map read), then the survivors stream through a vectorized
    per-batch filter.  Returns (Dataset, files_read, files_total).

    ``predicate``: (column, op, value) with op in <,<=,==,>=,>."""
    import operator

    import ray.data

    total = len(files)
    ops = {"<": operator.lt, "<=": operator.le, "==": operator.eq,
           ">=": operator.ge, ">": operator.gt}
    if predicate is None:
        if not files:
            return ray.data.from_arrow(empty_table), 0, 0
        return ray.data.read_parquet(files, columns=columns), total, total
    col, op, val = predicate
    if op not in ops:
        raise ValueError(f"op must be one of {sorted(ops)}")
    keep = []
    for f in files:
        md = pq.read_metadata(f)
        # resolve the PARQUET LEAF index by path: nested columns (the
        # metadata map) flatten into multiple leaves, so the arrow
        # schema position is NOT the statistics index
        ci = next(
            i for i in range(md.num_columns)
            if md.schema.column(i).path == col
        )
        intersects = False
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(ci).statistics
            if stats is None or not stats.has_min_max:
                intersects = True  # no stats -> cannot prune
                break
            lo, hi = stats.min, stats.max
            if op == "==" and lo <= val <= hi:
                intersects = True
            elif op in ("<", "<=") and ops[op](lo, val):
                intersects = True
            elif op in (">", ">=") and ops[op](hi, val):
                intersects = True
            if intersects:
                break
        if intersects:
            keep.append(f)
    if not keep:
        empty = empty_table
        if columns:
            empty = empty.select(columns)
        return ray.data.from_arrow(empty), 0, total
    read_cols = columns if columns is None else sorted(set(columns) | {col})
    ds = ray.data.read_parquet(keep, columns=read_cols)

    import pyarrow.compute as pc

    pc_ops = {"<": pc.less, "<=": pc.less_equal, "==": pc.equal,
              ">=": pc.greater_equal, ">": pc.greater}

    def flt(t: pa.Table) -> pa.Table:
        t = t.filter(pc_ops[op](t.column(col), pa.scalar(val)))
        return t.select(columns) if columns else t

    return (
        ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True),
        len(keep),
        total,
    )


def lake_scan(
    lake_dir: str,
    *,
    predicate: tuple[str, str, object] | None = None,
    columns: list[str] | None = None,
    generation: int | None = None,
):
    """Zone-map scan of the single-table lake (see
    :func:`pruned_parquet_scan`; merge-on-write keeps partitions
    sorted, so selective predicates touch few files)."""
    from ..schema import LAKE_SCHEMA

    manifest = _manifest_at(lake_dir, generation)
    return pruned_parquet_scan(
        manifest.data_files(lake_dir),
        LAKE_SCHEMA.empty_table(),
        predicate=predicate,
        columns=columns,
    )
