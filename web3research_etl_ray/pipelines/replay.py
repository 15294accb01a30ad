"""Replay pipeline — bounded backfill + incremental tail tick.

The Ray-Data-native re-expression of the reference's ``init`` loop
(src/ch_eth/init.rs:344-449: for num in from..=to → fetch → fan-out →
batched idempotent insert) and of one ``sync`` head-handling tick
(src/ch_eth/sync.rs:92-145).  Both collapse into ONE streaming plan:

    read_parquet(events, filter=commit_seq>watermark)   # prune at read
      → map_batches(Normalize)      # unify schema, sha256, part_id, orphan tag
      → map_batches(partial_lww)    # per-block combiner (pre-shuffle reduce)
      → groupby(part_id)            # the only all-to-all, over combined rows
          .map_groups(Merger, ...)  # actor-pool LWW merge + partition write
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

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray.data

from ..oracle import load_rollback_ranges
from ..stages.lww import partial_lww
from ..stages.merge import Merger
from ..stages.normalize import Normalize, orphan_mask
from ..state.manifest import (
    Manifest,
    PartitionEntry,
    commit_manifest,
    load_latest,
)

DEFAULT_NUM_PARTITIONS = 32


def event_files(stream_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(stream_dir, "events-*.parquet")))


def _find_repair_pids(
    lake_dir: str, prior: Manifest, new_ranges: list[tuple[int, int]]
) -> frozenset[int]:
    """Partitions whose stored state may contain winners orphaned by a
    *new* rollback range: decided from Parquet footer min/max stats on
    commit_seq — metadata-only, no data read.  (At 10^10 scale this
    loop over P footers would itself be a small ray task fan-out.)"""
    if not new_ranges:
        return frozenset()
    out = set()
    for pid, entry in prior.partitions.items():
        if not entry.file:
            continue
        md = pq.ParquetFile(os.path.join(lake_dir, entry.file)).metadata
        schema_idx = md.schema.to_arrow_schema().get_field_index("commit_seq")
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


def replay(
    stream_dir: str,
    lake_dir: str,
    *,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    batch_size: int = 8192,
    merge_concurrency: int | None = None,
    upto_seq: int | None = None,
    force_repair_pids: frozenset[int] = frozenset(),
) -> Manifest:
    """Run one replay/tail generation; returns the committed manifest.

    First call = full backfill (reference ``init``); subsequent calls =
    incremental tick past the stored watermark (reference ``sync``),
    including rollback repair for newly-seen orphan ranges.
    """
    files = event_files(stream_dir)
    if not files:
        raise FileNotFoundError(f"no events-*.parquet under {stream_dir}")
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
    repair_pids = force_repair_pids
    if prior is not None:
        repair_pids = repair_pids | _find_repair_pids(lake_dir, prior, new_ranges)
        if prior.num_partitions != num_partitions:
            # repartitioning the lake = rebuild everything from history
            repair_pids = frozenset(range(num_partitions))

    # --- read: prune row groups via commit_seq pushdown --------------------
    expr = None
    if watermark >= 0 and not repair_pids:
        expr = pc.field("commit_seq") > watermark
    if upto_seq is not None:
        e = pc.field("commit_seq") <= upto_seq
        expr = e if expr is None else (expr & e)
    read_kwargs = {"filter": expr} if expr is not None else {}
    # Files arrive in multiple schema versions (v1/v2/v3 — FIXTURES.md §3);
    # Ray's batcher concatenates blocks within a stage, so each version
    # group is read+normalized separately and unioned once unified.
    groups: dict[tuple, list[str]] = {}
    for f in files:
        key = tuple(pq.ParquetFile(f).schema_arrow.names)
        groups.setdefault(key, []).append(f)
    # instance (not class) → stateless, elastic tasks; the tiny range
    # table travels in the serialized closure, broadcast once per task
    normalize = Normalize(num_partitions, ranges)
    parts = [
        ray.data.read_parquet(g, **read_kwargs).map_batches(
            normalize,
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )
        for g in groups.values()
    ]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)

    if watermark >= 0 and repair_pids:
        # incremental + repair: keep fresh events everywhere, full
        # history only for partitions being rebuilt
        repair_list = sorted(repair_pids)

        def _route(t, _wm=watermark, _rp=repair_list):
            keep = pc.or_(
                pc.greater(t.column("commit_seq"), _wm),
                pc.is_in(t.column("part_id"), value_set=pa.array(_rp)),
            )
            return t.filter(keep)

        ds = ds.map_batches(_route, batch_format="pyarrow", zero_copy_batch=True)

    ds = ds.map_batches(
        partial_lww,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )

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

    if merge_concurrency is None:
        # leave headroom: an actor pool that reserves every CPU starves
        # the read/normalize/sort stages and the pipeline stalls
        cpus = int(ray.cluster_resources().get("CPU", 4))
        merge_concurrency = max(1, min(num_partitions, cpus // 2))

    entries_ds = ds.groupby("part_id").map_groups(
        Merger,
        fn_constructor_args=(
            lake_dir,
            generation,
            prior_files,
            prior_entries,
            repair_pids,
        ),
        batch_format="pyarrow",
        concurrency=merge_concurrency,
    )

    # P small lineage rows — the only driver-side materialization
    rows = entries_ds.take_all()

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
        )
    # carry forward untouched partitions from the prior generation
    if prior is not None:
        for pid, e in prior.partitions.items():
            if pid not in partitions:
                partitions[pid] = e
    # ensure every partition id exists (empty lake partitions)
    global_wm = max(
        [p.watermark_seq for p in partitions.values()] + [watermark, -1]
    )
    for pid in range(num_partitions):
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
    )
    commit_manifest(lake_dir, manifest)
    return manifest


def read_lake(lake_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Dataset over the current committed lake state (manifest-listed
    files only — staged/orphaned files are invisible)."""
    manifest = load_latest(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no committed manifest under {lake_dir}")
    files = manifest.data_files(lake_dir)
    if not files:
        return ray.data.from_items([])
    kwargs = {"columns": columns} if columns else {}
    return ray.data.read_parquet(files, **kwargs)


def lake_table(lake_dir: str):
    """Driver-side pyarrow.Table of the lake (tests / small results only)."""
    manifest = load_latest(lake_dir)
    files = manifest.data_files(lake_dir) if manifest else []
    import pyarrow as pa

    from ..schema import LAKE_SCHEMA

    if not files:
        return LAKE_SCHEMA.empty_table()
    return pads.dataset(files).to_table()
