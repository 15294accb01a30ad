"""Multi-table fan-out replay — one stream, N lake tables, ONE commit.

The reference's defining ingest shape: every block fans out into rows
of several logical tables which are inserted together — 5 for eth
(src/ch_eth/init.rs:146-341, concurrent inserts :403-424), 44 for tron
(src/ch_tron/init.rs:76-214).  ClickHouse gives it no cross-table
atomicity; a crash mid-loop leaves the tables mutually inconsistent
until re-inserts catch up.  This pipeline makes the fan-out a
first-class Ray Data plan with an exactly-once, *cross-table atomic*
sink:

    read events ONCE (watermark-pruned)
      → map_batches: unify → orphan-tag → per-table derive → per-table
        partial LWW → pad to union schema, tag __table
      → write_parquet(partition_cols=[__table, part_id])   # one spool
      → map_batches over (table, pid) units: per-table LWW merge-on-
        write into tables/<name>/data/gen=G/part-P.parquet
      → commit ONE MultiManifest (single LATEST swap)

Because every table's files for generation G are published by one
pointer swap, no table can be a generation ahead of another — the
atomic analogue of the reference's per-block multi-table insert loop.

Each derived table is a :class:`FanoutTable`: a TableSpec plus a
vectorized ``derive`` fn mapping the unified event batch to that
table's change rows (op + order col included).  Derivation runs inside
the single shared read — tables do NOT re-read the stream.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray.data

from ..functions.hashing import key_hash64
from ..oracle import load_rollback_ranges
from ..schema import (
    REPO_FILES,
    TableSpec,
    schema_version_of,
    unify_to,
)
from ..stages.lww import agg_kwargs, fold_lww, partial_lww
from ..stages.merge import ENTRY_SCHEMA, Merger
from ..stages.normalize import orphan_mask
from ..state.manifest import (
    MultiManifest,
    PartitionEntry,
    TableState,
    commit_multi_manifest,
    load_latest_multi,
    table_dir,
)
from .replay import (
    DEFAULT_SPLIT_THRESHOLD_ROWS,
    MAX_SPLIT_DEPTH,
    _file_seq_ranges,
    _find_repair_pids,
    _run_split_items,
    event_files,
    plan_split_items,
)


@dataclass(frozen=True)
class FanoutTable:
    """One derived lake table: spec + vectorized batch-level derivation.

    ``derive`` maps a unified event batch to this table's change rows
    (must emit the spec's flight columns including order/op cols).
    ``None`` = identity (the base table).

    ``num_partitions``: per-table partition count override (None =
    the replay call's shared default).  Derived tables of one stream
    can differ 100× in key cardinality (repo_files vs repo_heads) —
    a 20-key aggregate table has no business carrying the base
    table's 256 partitions' worth of merge tasks and files.
    """

    spec: TableSpec
    derive: Callable[[pa.Table], pa.Table] | None = None
    num_partitions: int | None = None


def _union_flight_schema(tables: list[FanoutTable]) -> pa.Schema:
    fields: dict[str, pa.Field] = {}
    for ft in tables:
        for f in ft.spec.flight_schema:
            fields.setdefault(f.name, pa.field(f.name, f.type, nullable=True))
    extra = [
        pa.field("part_id", pa.int64()),
        pa.field("orphaned", pa.bool_()),
        pa.field("schema_version", pa.int8()),
        pa.field("n_events", pa.int64()),
        pa.field("__table", pa.string()),
    ]
    return pa.schema(list(fields.values()) + extra)


def _pad(t: pa.Table, target: pa.Schema) -> pa.Table:
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


class FanoutNormalize:
    """map_batches stage: one pass deriving every table's combined rows.

    Setup (specs, ranges, union schema) happens once per task closure —
    the reference's create-once client pattern (src/ch_eth/init.rs:125-137).
    """

    def __init__(
        self,
        tables: list[FanoutTable],
        num_partitions: int,
        orphan_ranges: list[tuple[int, int]],
        base_spec: TableSpec = REPO_FILES,
        wm_by_table: dict | None = None,
        repair_pids: dict[str, frozenset[int]] | None = None,
        p_by_table: dict[str, int] | None = None,
        depths_by_table: dict[str, dict[int, int]] | None = None,
    ):
        self.tables = tables
        self.num_partitions = num_partitions
        #: per-table partition count (defaults to the shared count)
        self.p_by_table = p_by_table or {
            ft.spec.name: num_partitions for ft in tables
        }
        #: per-table split layout (dense depth vector per base pid)
        from ..stages.normalize import depth_vector

        self.depthvec_by_table = {
            ft.spec.name: depth_vector(
                self.p_by_table[ft.spec.name],
                (depths_by_table or {}).get(ft.spec.name),
            )
            for ft in tables
        }
        self.ranges = sorted(orphan_ranges)
        self.base_spec = base_spec
        #: per-table per-PARTITION committed watermarks (len
        #: num_partitions, -1 = empty).  Exact routing: a row reaches a
        #: partition only if past that partition's own watermark — the
        #: read filter prunes only at the global min, and re-delivery,
        #: harmless under LWW, would double-count additive (sum_cols)
        #: tables.
        self.wm_by_table = wm_by_table or {}
        self.repair_pids = repair_pids or {}
        self.union_schema = _union_flight_schema(tables)

    def __call__(self, batch: pa.Table) -> pa.Table:
        base = self.base_spec
        version = schema_version_of(batch.schema)
        batch = unify_to(batch, base.flight_schema)
        if batch.column(base.op_col).null_count:
            idx = batch.schema.get_field_index(base.op_col)
            batch = batch.set_column(
                idx, base.op_col, pc.fill_null(batch.column(base.op_col), "upsert")
            )
        outs = []
        for ft in self.tables:
            spec = ft.spec
            rows = ft.derive(batch) if ft.derive is not None else batch
            seqs = rows.column(spec.order_col).to_numpy(zero_copy_only=False)
            orphaned = orphan_mask(seqs, self.ranges)
            from ..stages.normalize import route_pids

            pid = route_pids(
                key_hash64(*[rows.column(k) for k in spec.key]),
                self.p_by_table[spec.name],
                self.depthvec_by_table.get(spec.name),
            )
            rows = rows.append_column("part_id", pa.array(pid, pa.int64()))
            rows = rows.append_column("orphaned", pa.array(orphaned))
            rows = rows.append_column(
                "schema_version", pa.array(np.full(len(rows), version, dtype=np.int8))
            )
            wm = self.wm_by_table.get(spec.name)
            if wm is not None and rows.num_rows:
                wm_ids, wm_arr = wm  # sorted extended ids + watermarks
                repair = self.repair_pids.get(spec.name, frozenset())
                keep = seqs > wm_arr[np.searchsorted(wm_ids, pid)]
                if repair:
                    keep |= np.isin(pid, np.array(sorted(repair), dtype=np.int64))
                if not keep.all():
                    rows = rows.filter(pa.array(keep))
            rows = partial_lww(rows, spec)
            rows = rows.append_column(
                "__table", pa.array([spec.name] * rows.num_rows, pa.string())
            )
            outs.append(_pad(rows, self.union_schema))
        return pa.concat_tables(outs)


class FanoutMerger:
    """Merge stage over (table, pid) unit rows: per-table LWW merge-on-
    write, one lineage entry row per unit (tagged with the table)."""

    def __init__(
        self,
        spool_dir: str,
        lake_dir: str,
        generation: int,
        tables: list[FanoutTable],
        prior: MultiManifest | None,
        repair_pids: dict[str, frozenset[int]],
    ):
        self.spool_dir = spool_dir
        self.mergers: dict[str, Merger] = {}
        for ft in tables:
            name = ft.spec.name
            ts = prior.tables.get(name) if prior else None
            tdir = table_dir(lake_dir, name)
            prior_files = {
                pid: (os.path.join(tdir, e.file) if e.file else None)
                for pid, e in (ts.partitions.items() if ts else ())
            }
            prior_entries = {
                pid: {
                    "watermark_seq": e.watermark_seq,
                    "events_applied": e.events_applied,
                    "events_superseded": e.events_superseded,
                    "events_rolled_back": e.events_rolled_back,
                    "schema_version": e.schema_version,
                }
                for pid, e in (ts.partitions.items() if ts else ())
            }
            self.mergers[name] = Merger(
                tdir,
                generation,
                prior_files,
                prior_entries,
                repair_pids.get(name, frozenset()),
                ft.spec,
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            name, pid = row["table"], int(row["pid"])
            merger = self.mergers[name]
            d = os.path.join(self.spool_dir, f"__table={name}", f"part_id={pid}")
            if os.path.isdir(d):
                group = pads.dataset(d).to_table()
                # restore flight-only columns the spool carries implicitly
                group = group.append_column(
                    "part_id", pa.array([pid] * group.num_rows, pa.int64())
                )
                keep = [
                    f.name
                    for f in merger.spec.flight_schema
                ] + ["part_id", "orphaned", "schema_version", "n_events"]
                group = group.select([c for c in keep if c in group.column_names])
            else:
                from ..stages.merge import _empty_group

                group = _empty_group(merger.spec)
            entry = merger.merge(pid, group)
            entry = entry.append_column(
                "table", pa.array([name] * entry.num_rows, pa.string())
            )
            out.append(entry)
        if not out:
            return ENTRY_SCHEMA.append(pa.field("table", pa.string())).empty_table()
        return pa.concat_tables(out)


def replay_fanout(stream_dir: str, lake_dir: str, tables, **kw) -> MultiManifest:
    """One fan-out replay generation under the lake's single-writer
    lease; see :func:`_replay_fanout_impl` for parameters."""
    from ..state.manifest import acquire_lease, release_lease

    created = acquire_lease(lake_dir)
    try:
        return _replay_fanout_impl(stream_dir, lake_dir, tables, **kw)
    finally:
        if created:
            release_lease(lake_dir)


def _replay_fanout_impl(
    stream_dir: str,
    lake_dir: str,
    tables: list[FanoutTable],
    *,
    num_partitions: int | str = 16,
    upto_seq: int | None = None,
    force_repair_pids: dict[str, frozenset[int]] | None = None,
    split_threshold_rows: int | None = DEFAULT_SPLIT_THRESHOLD_ROWS,
    _crash_before_commit: bool = False,
) -> MultiManifest:
    """One fan-out replay generation: every table advances together or
    not at all.  Resume/tick semantics mirror :func:`replay` — watermark
    pruning at the read, rollback repair per table, idempotent LWW
    merge, two-phase publish."""
    files = event_files(stream_dir)
    if not files:
        raise FileNotFoundError(f"no events-*.parquet under {stream_dir}")
    auto = num_partitions in ("auto", None)
    if auto:
        from .replay import auto_partitions

        num_partitions = auto_partitions(files)
    # per-table partition counts: an explicit FanoutTable.num_partitions
    # wins; otherwise a resumed table keeps its committed count under
    # "auto" (changing it forces a full repartition repair of the
    # table), else the shared default.
    prior0 = load_latest_multi(lake_dir)
    p_by_table: dict[str, int] = {}
    for ft in tables:
        ts0 = prior0.tables.get(ft.spec.name) if prior0 else None
        if ft.num_partitions:
            p_by_table[ft.spec.name] = int(ft.num_partitions)
        elif auto and ts0 is not None:
            p_by_table[ft.spec.name] = ts0.num_partitions
        else:
            p_by_table[ft.spec.name] = int(num_partitions)
    base_spec = tables[0].spec if tables[0].derive is None else REPO_FILES
    ranges = [
        (lo, hi)
        for lo, hi in load_rollback_ranges(stream_dir)
        if upto_seq is None or lo <= upto_seq
    ]

    prior = load_latest_multi(lake_dir)
    generation = 0 if prior is None else prior.generation + 1
    watermark = prior.min_watermark if prior else -1
    prior_rb = (
        {tuple(r) for r in prior.applied_rollbacks} if prior else set()
    )
    new_ranges = [r for r in ranges if tuple(r) not in prior_rb]
    # per-table split layouts carry from the prior generation; a
    # repartitioned table starts a fresh unsplit layout
    depths_by_table: dict[str, dict[int, int]] = {}
    for ft in tables:
        name = ft.spec.name
        ts = prior.tables.get(name) if prior else None
        if ts is not None and ts.num_partitions == p_by_table[name]:
            depths_by_table[name] = dict(ts.split_depths)
        else:
            depths_by_table[name] = {}

    repair_pids: dict[str, frozenset[int]] = {}
    if prior is not None:
        for ft in tables:
            name = ft.spec.name
            ts = prior.tables.get(name)
            if ts is None:
                # a table added mid-stream: full rebuild of that table
                repair_pids[name] = frozenset(range(p_by_table[name]))
                continue
            pids = _find_repair_pids(
                table_dir(lake_dir, name),
                ts.partitions,
                new_ranges,
                ft.spec.order_col,
            )
            if ts.num_partitions != p_by_table[name]:
                pids = frozenset(range(p_by_table[name]))
            if pids:
                repair_pids[name] = pids
    if force_repair_pids:
        # externally detected corruption (check_fanout) — rebuild
        # those partitions from history in this generation.  check
        # reports BASE-level pids; expand to the table's split layout.
        from .replay import _expand_repair_pids

        for name, pids in force_repair_pids.items():
            repair_pids[name] = repair_pids.get(name, frozenset()) | (
                _expand_repair_pids(
                    frozenset(pids), p_by_table[name], depths_by_table[name]
                )
            )
    any_repair = any(repair_pids.values())

    if watermark >= 0 and not any_repair:
        ranges_by_file = _file_seq_ranges(files, lake_dir, base_spec.order_col)
        files = [f for f in files if ranges_by_file[f][1] > watermark]
        if not files:
            manifest = MultiManifest(
                generation=generation,
                tables={
                    n: TableState(
                        name=n,
                        num_partitions=ts.num_partitions,
                        partitions=dict(ts.partitions),
                        schema_version=ts.schema_version,
                        split_depths=dict(ts.split_depths),
                    )
                    for n, ts in prior.tables.items()
                },
                applied_rollbacks=sorted([list(r) for r in ranges]),
                parent_generation=prior.generation,
            )
            if _crash_before_commit:
                raise RuntimeError("injected crash before commit")
            commit_multi_manifest(lake_dir, manifest)
            return manifest
    expr = None
    if watermark >= 0 and not any_repair:
        expr = pc.field(base_spec.order_col) > watermark
    if upto_seq is not None:
        e = pc.field(base_spec.order_col) <= upto_seq
        expr = e if expr is None else (expr & e)
    read_kwargs = {"filter": expr} if expr is not None else {}

    from ..state.manifest import extended_pids as _ext_pids

    wm_by_table: dict = {}
    if prior is not None:
        for ft in tables:
            name = ft.spec.name
            ts = prior.tables.get(name)
            if ts is None or ts.num_partitions != p_by_table[name]:
                # new or repartitioned table: full-rebuild repair set
                # already covers it — no watermark routing
                wm_by_table[name] = None
                continue
            ids = np.asarray(
                _ext_pids(p_by_table[name], depths_by_table[name]),
                dtype=np.int64,
            )
            arr = np.full(len(ids), -1, dtype=np.int64)
            pos = {int(p): i for i, p in enumerate(ids)}
            for _pid, _e in ts.partitions.items():
                i = pos.get(int(_pid))
                if i is not None:
                    arr[i] = _e.watermark_seq
            wm_by_table[name] = (ids, arr)
    stage = FanoutNormalize(
        tables, num_partitions, ranges, base_spec, wm_by_table, repair_pids,
        p_by_table, depths_by_table,
    )
    # second-level combiner (same win as single-table replay): fold
    # coalesced winner blocks per (__table, key, part_id) before the
    # spool — cuts exchange rows/files by the coalescing factor
    def second_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        outs = []
        for ft in tables:
            sub = t.filter(pc.equal(t.column("__table"), ft.spec.name))
            if sub.num_rows:
                outs.append(
                    fold_lww(
                        sub, "n_events",
                        tuple(ft.spec.key) + ("part_id",),
                        ft.spec.order_col,
                        **agg_kwargs(ft.spec),
                    )
                )
        return pa.concat_tables(outs) if outs else t.slice(0, 0)

    # Fused per-file read → FanoutNormalize → inline combine (the same
    # shape as replay.read_norm_partial, and for the same reasons:
    # ray.data.read_parquet's driver-side metadata/sampling is 2-3 s of
    # per-job fixed cost, and a separate exact-size rebatching combiner
    # stage re-concatenates the string-heavy remainder quadratically).
    _filter_expr = read_kwargs.get("filter")

    def read_stage(t: pa.Table):
        buf: list[pa.Table] = []
        nbuf = 0
        for path in t.column("path").to_pylist():
            scanner = pads.dataset(path).scanner(
                filter=_filter_expr, batch_size=128 * 1024
            )
            for rb in scanner.to_batches():
                if not rb.num_rows:
                    continue
                w = stage(pa.Table.from_batches([rb]))
                if not w.num_rows:
                    continue
                buf.append(w)
                nbuf += w.num_rows
                if nbuf >= (1 << 18):
                    yield second_fold(pa.concat_tables(buf))
                    buf, nbuf = [], 0
        if buf:
            yield second_fold(pa.concat_tables(buf))

    # Driver-local tick (same rationale + gates as replay's
    # exchange="driver" leg): a small pruned tick over an existing
    # small multi-lake skips BOTH Ray Data executions (spool write +
    # unit merge) — the whole tick runs in-process through the SAME
    # FanoutNormalize/second_fold closures and the SAME per-table
    # Mergers, with the per-table merges fused into one read + one
    # fold + per-partition slice writes.  This is what makes
    # sync_fanout(watch=True) a low-latency push tail at 44-table
    # width.
    input_bytes = sum(os.path.getsize(f) for f in files)
    prior_bytes = 0
    if prior is not None:
        for name, ts in prior.tables.items():
            for f in ts.data_files(table_dir(lake_dir, name)):
                try:
                    prior_bytes += os.path.getsize(f)
                except OSError:
                    pass
    # Gate is TIGHTER than single-table replay's 32 MB: the driver leg
    # pays the ~13-tables-per-event derive single-threaded, so it wins
    # only for genuinely small heads (measured: 300 KB head 0.7 s vs
    # 1.0 s distributed; 2.8 MB head loses 1.9 s vs 1.4 s).
    # gen-0 builds qualify too (prior_bytes is then 0): a tiny fresh
    # 44-table lake pays the same two Ray executions a tick does
    use_driver = (
        input_bytes
        < int(os.environ.get("W3R_FANOUT_DRIVER_TICK_BYTES", 1 << 20))
        and prior_bytes
        < int(os.environ.get("W3R_FUSED_MERGE_BYTES", 16 << 20)) * 4
    )
    entries: list[dict] = []
    if use_driver:
        from ..stages.merge import _empty_group, fused_tiny_merge

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
                w = stage(pa.Table.from_batches([rb]))
                if not w.num_rows:
                    continue
                buf.append(w)
                nbuf += w.num_rows
                if nbuf >= (1 << 18):
                    winners.append(
                        second_fold(
                            pa.concat_tables(buf, promote_options="default")
                        )
                    )
                    buf, nbuf = [], 0
        if buf:
            winners.append(
                second_fold(
                    pa.concat_tables(buf, promote_options="default")
                )
            )
        folded_all = (
            pa.concat_tables(winners, promote_options="default")
            if winners
            else None
        )
        fm = FanoutMerger(
            "", lake_dir, generation, tables, prior, repair_pids
        )
        for ft in tables:
            name = ft.spec.name
            merger = fm.mergers[name]
            touched: set[int] = set()
            sub = None
            if folded_all is not None and folded_all.num_rows:
                sub = folded_all.filter(
                    pc.equal(folded_all.column("__table"), name)
                )
            if sub is not None and sub.num_rows:
                keep = [f.name for f in ft.spec.flight_schema] + [
                    "part_id",
                    "orphaned",
                    "schema_version",
                    "n_events",
                ]
                sub = sub.select(
                    [c for c in keep if c in sub.column_names]
                )
                rows = fused_tiny_merge(merger, sub)
                for r in rows:
                    r["table"] = name
                entries.extend(rows)
                touched = {int(r["part_id"]) for r in rows}
            for pid in sorted(
                set(repair_pids.get(name, frozenset())) - touched
            ):
                d = merger.merge(pid, _empty_group(ft.spec)).to_pylist()[0]
                d["table"] = name
                entries.append(d)
    else:
        ds = ray.data.from_items(
            [{"path": f} for f in files], override_num_blocks=len(files)
        ).map_batches(
            read_stage, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )

        spool_dir = os.path.join(lake_dir, "_shuffle", f"gen={generation:06d}")
        shutil.rmtree(spool_dir, ignore_errors=True)
        ds.write_parquet(
            spool_dir, partition_cols=["__table", "part_id"],
            compression="lz4",
        )

        units: list[dict] = []
        for ft in tables:
            name = ft.spec.name
            tdir = os.path.join(spool_dir, f"__table={name}")
            try:
                spooled = sorted(
                    int(d.split("=")[1])
                    for d in os.listdir(tdir)
                    if d.startswith("part_id=")
                )
            except FileNotFoundError:
                spooled = []
            for p in sorted(
                set(spooled) | set(repair_pids.get(name, frozenset()))
            ):
                units.append({"table": name, "pid": p})

        if units:
            unit_ds = ray.data.from_items(
                units, override_num_blocks=len(units)
            )
            merger = FanoutMerger(
                spool_dir, lake_dir, generation, tables, prior, repair_pids
            )

            def merge_fn(batch, _m=merger):
                return _m(batch)

            entries = unit_ds.map_batches(
                merge_fn, batch_format="pyarrow", batch_size=None
            ).take_all()  # one small lineage row per (table, pid)
        shutil.rmtree(spool_dir, ignore_errors=True)

    states: dict[str, TableState] = {}
    for ft in tables:
        name = ft.spec.name
        prior_ts = prior.tables.get(name) if prior else None
        partitions: dict[int, PartitionEntry] = {}
        for r in entries:
            if r["table"] != name:
                continue
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
        # carry forward untouched partitions — only under an unchanged
        # layout (a repartitioned table rebuilt every new pid; stale
        # old-layout ids must not leak into the new manifest)
        valid = _ext_pids(p_by_table[name], depths_by_table[name])
        if prior_ts is not None and prior_ts.num_partitions == p_by_table[name]:
            valid_set = set(valid)
            for pid, e in prior_ts.partitions.items():
                if pid not in partitions and pid in valid_set:
                    partitions[pid] = e
        global_wm = max(
            [p.watermark_seq for p in partitions.values()] + [watermark, -1]
        )
        for pid in valid:
            if pid not in partitions:
                partitions[pid] = PartitionEntry(
                    part_id=pid, file=None, watermark_seq=global_wm
                )
        states[name] = TableState(
            name=name,
            num_partitions=p_by_table[name],
            partitions=partitions,
            schema_version=max(p.schema_version for p in partitions.values()),
            split_depths=depths_by_table[name],
        )

    manifest = MultiManifest(
        generation=generation,
        tables=states,
        applied_rollbacks=sorted([list(r) for r in ranges]),
        parent_generation=None if prior is None else prior.generation,
    )
    if _crash_before_commit:
        raise RuntimeError("injected crash before commit")
    commit_multi_manifest(lake_dir, manifest)
    # growth-adaptive per-table layout (same contract as single-table
    # replay): any table partition past the threshold doubles its base
    while split_threshold_rows:
        bases_by_table: dict[str, list[int]] = {}
        for name, ts in manifest.tables.items():
            over = sorted(
                {
                    int(pid) % ts.num_partitions
                    for pid, e in ts.partitions.items()
                    if e.num_rows > split_threshold_rows
                    and ts.depth_of(int(pid) % ts.num_partitions)
                    < MAX_SPLIT_DEPTH
                }
            )
            if over:
                bases_by_table[name] = over
        if not bases_by_table:
            break
        manifest = split_fanout_partitions(lake_dir, tables, bases_by_table)
    return manifest


def split_fanout_partitions(
    lake_dir: str,
    tables: list[FanoutTable],
    bases_by_table: dict[str, list[int]],
) -> MultiManifest:
    """Split the given base partitions of the given TABLES one depth
    level each and commit ONE new multi-table generation.  Only the
    named tables' oversized partitions rewrite; every other partition
    of every table is carried forward — the cross-table-atomic version
    of :func:`..replay.split_partitions` (same streaming one-pass
    worker, same extended-id routing)."""
    from ..state.manifest import acquire_lease, release_lease

    created = acquire_lease(lake_dir)
    try:
        prior = load_latest_multi(lake_dir)
        if prior is None:
            raise FileNotFoundError(f"no committed multi-lake under {lake_dir}")
        specs = {ft.spec.name: ft.spec for ft in tables}
        generation = prior.generation + 1
        states: dict[str, TableState] = {}
        for name, ts in prior.tables.items():
            partitions = dict(ts.partitions)
            depths = dict(ts.split_depths)
            if name in bases_by_table:
                spec = specs[name]
                items = plan_split_items(
                    ts.partitions, ts.num_partitions, depths,
                    bases_by_table[name], partitions,
                )
                rows = _run_split_items(
                    table_dir(lake_dir, name), generation, ts.num_partitions,
                    list(spec.key), items,
                )
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
                        last_gen_events=0,
                    )
            states[name] = TableState(
                name=name,
                num_partitions=ts.num_partitions,
                partitions=partitions,
                schema_version=ts.schema_version,
                split_depths=depths,
            )
        manifest = MultiManifest(
            generation=generation,
            tables=states,
            applied_rollbacks=list(prior.applied_rollbacks),
            parent_generation=prior.generation,
        )
        commit_multi_manifest(lake_dir, manifest)
        return manifest
    finally:
        if created:
            release_lease(lake_dir)


def read_fanout_table(
    lake_dir: str, table: str, columns: list[str] | None = None,
    *, generation: int | None = None, tag: str | None = None,
) -> ray.data.Dataset:
    """Dataset over one table of the committed multi-table lake;
    ``generation`` time-travels to any generation on the committed
    chain (tables stay mutually consistent — one multi-manifest pins
    every table's file set together); ``tag`` reads the snapshot
    pinned by ``create_tag_multi`` (survives GC)."""
    from ..state.manifest import multi_manifest_at, resolve_tag

    if tag is not None:
        if generation is not None:
            raise ValueError("pass generation= or tag=, not both")
        generation = resolve_tag(lake_dir, tag)
    manifest = multi_manifest_at(lake_dir, generation)
    if table not in manifest.tables:
        raise FileNotFoundError(f"no committed table {table} under {lake_dir}")
    files = manifest.tables[table].data_files(lake_dir)
    if not files:
        return ray.data.from_items([])
    kwargs = {"columns": columns} if columns else {}
    return ray.data.read_parquet(files, **kwargs)


def fanout_table(lake_dir: str, table: str,
                 *, generation: int | None = None,
                 tag: str | None = None) -> pa.Table:
    """Driver-side pyarrow.Table of one lake table (tests/small results)."""
    from ..state.manifest import multi_manifest_at, resolve_tag

    if tag is not None:
        if generation is not None:
            raise ValueError("pass generation= or tag=, not both")
        generation = resolve_tag(lake_dir, tag)
    manifest = multi_manifest_at(lake_dir, generation)
    if table not in manifest.tables:
        raise FileNotFoundError(f"no committed table {table} under {lake_dir}")
    files = manifest.tables[table].data_files(lake_dir)
    if not files:
        return pa.table({})
    return pads.dataset(files).to_table()


def fanout_scan(
    lake_dir: str,
    table: str,
    *,
    predicate: tuple[str, str, object] | None = None,
    columns: list[str] | None = None,
):
    """Zone-map scan of ONE table of the multi-table lake (see
    replay.pruned_parquet_scan).  Returns (Dataset, files_read,
    files_total)."""
    from .replay import pruned_parquet_scan

    manifest = load_latest_multi(lake_dir)
    if manifest is None or table not in manifest.tables:
        raise FileNotFoundError(f"no committed table {table} under {lake_dir}")
    files = manifest.tables[table].data_files(lake_dir)
    empty = (
        pads.dataset(files[:1]).schema.empty_table()
        if files
        else pa.table({})
    )
    return pruned_parquet_scan(
        files, empty, predicate=predicate, columns=columns
    )
