"""Tail loop — the reference's ``sync`` subcommand
(src/ch_eth/sync.rs:357-434): follow new heads + periodic self-heal.

The reference subscribes to a WS push stream and handles each head
serially (listen_updates, src/ch_eth/sync.rs:118-145), plus a 4-hour
interval health check over the trailing 100k blocks (:406-431).  Our
source is an append-only Parquet event log, so "subscribe" becomes a
poll: each tick runs one incremental replay generation (which reads
only events past the stored watermark via Parquet predicate pushdown)
and every ``check_every`` ticks a bounded conformance re-check + repair
runs over the trailing ``check_window`` commit range.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from ..state.manifest import Manifest, load_latest
from .check import CheckReport, check_and_repair
from .replay import replay


def tail_once(stream_dir: str, lake_dir: str, **replay_kw) -> Manifest:
    """One sync tick: apply all events past the watermark, commit."""
    return replay(stream_dir, lake_dir, **replay_kw)


def _stream_signature(stream_dir: str) -> tuple:
    """Cheap change signature of the landing zone: (name, size,
    mtime_ns) of every event segment.  A stat poll over this tuple is
    the sandbox analogue of the reference's WS push subscription
    (src/ch_eth/sync.rs:118-145) — new heads are detected within one
    poll interval instead of one fixed tick interval."""
    import os

    sig = []
    try:
        for f in sorted(os.listdir(stream_dir)):
            if f.startswith("events-") and f.endswith(".parquet"):
                st = os.stat(os.path.join(stream_dir, f))
                sig.append((f, st.st_size, st.st_mtime_ns))
    except FileNotFoundError:
        pass
    return tuple(sig)


def _wait_for_change(
    stream_dir: str,
    prev_sig: tuple | None,
    wire,
    poll_s: float,
    timeout_s: float | None,
) -> tuple | None:
    """Block until the landing zone's signature differs from
    ``prev_sig`` (draining ``wire`` each poll), returning the new
    signature — or None when ``timeout_s`` elapses idle.
    ``prev_sig=None`` returns immediately (first tick applies the
    existing backlog)."""
    if wire is not None:
        wire.land_new()
    cur = _stream_signature(stream_dir)
    # first tick: apply the existing backlog — but an EMPTY landing
    # zone means the producer hasn't landed anything yet; block for
    # the first head instead of failing the tick
    if (cur != prev_sig) and (prev_sig is not None or cur):
        return cur
    deadline = (
        None if timeout_s is None else time.monotonic() + timeout_s
    )
    while cur == prev_sig or not cur:
        if deadline is not None and time.monotonic() > deadline:
            return None
        time.sleep(poll_s)
        if wire is not None:
            wire.land_new()
        cur = _stream_signature(stream_dir)
    return cur


def sync(
    stream_dir: str,
    lake_dir: str,
    *,
    max_ticks: int | None = None,
    poll_interval_s: float = 0.0,
    check_every: int = 0,
    check_window: int = 100_000,
    gc_keep: int = 5,
    on_tick: Callable[[int, Manifest], None] | None = None,
    dedup_index_root: str | None = None,
    dedup_threshold: float = 0.5,
    on_dedup_pairs: Callable[[int, "object"], None] | None = None,
    wire=None,
    export_out: str | None = None,
    watch: bool = False,
    watch_poll_s: float = 0.02,
    watch_timeout_s: float | None = None,
    **replay_kw,
) -> list[CheckReport]:
    """Run the tail loop.  ``max_ticks`` bounds it for tests/CLI;
    ``check_every=k`` runs the trailing-window health check every k
    ticks (reference cadence: every 4h over 100k blocks,
    src/ch_eth/sync.rs:348,406).

    ``watch=True`` is the push-per-head mode (VERDICT r04 Next #5,
    reference src/ch_eth/sync.rs:118-145): instead of ticking on a
    fixed ``poll_interval_s``, the loop BLOCKS until the landing zone
    actually changes (bounded-interval stat poll every
    ``watch_poll_s``; a ``wire`` is drained inside the wait) and
    applies the new head immediately — detection latency is one poll
    interval, not one tick interval.  ``watch_timeout_s`` bounds the
    idle wait: when no new data lands within it the loop returns
    (None = block until ``max_ticks``).

    ``wire`` (a ``sources.wal.WalTail`` / ``sources.debezium.
    DebeziumTail``) makes this the full "binlog/WAL tail -> lake
    upsert" loop: each tick first lands the wire bytes appended since
    the last tick into ``stream_dir`` (the canonical landing zone),
    then replays past the watermark as usual.

    ``dedup_index_root`` enables INLINE near-dup detection at ingest:
    after each tick commits, the tick's newly applied upsert contents
    (``commit_seq`` in (prev watermark, new watermark], read with
    Parquet pushdown) flow into the persistent MinHash band index
    (``pipelines/dedup_index.py``) keyed by commit_seq, and the pairs
    found — vs the whole ingest history, at O(tick) cost — go to
    ``on_dedup_pairs(tick, pairs_table)``.

    ``export_out`` closes the relay: after each tick commits, the
    generation is published downstream as Debezium JSONL
    (``sources.debezium.export_tick`` — snapshot on the first tick,
    changelog after), so the loop is simultaneously a wire CONSUMER
    (``wire=``) and a wire PRODUCER."""
    reports: list[CheckReport] = []
    tick = 0
    prev_wm = None
    prev_sig: tuple | None = None
    if dedup_index_root is not None:
        m0 = load_latest(lake_dir)
        prev_wm = m0.max_watermark if m0 is not None else -1
    while max_ticks is None or tick < max_ticks:
        if watch:
            cur = _wait_for_change(
                stream_dir,
                prev_sig if tick > 0 else None,
                wire,
                watch_poll_s,
                watch_timeout_s,
            )
            if cur is None:
                return reports  # idle: no new head within bound
            prev_sig = cur
        elif wire is not None:
            wire.land_new()
        manifest = tail_once(stream_dir, lake_dir, **replay_kw)
        if on_tick:
            on_tick(tick, manifest)
        if export_out is not None:
            # publish the tick downstream (continuous outbox).  Running
            # INSIDE the loop keeps the export cursor at most one
            # generation behind — always within the gc_keep window, so
            # the changelog diff can never lose its base snapshot.
            from ..sources.debezium import export_tick

            export_tick(lake_dir, export_out)
        if dedup_index_root is not None:
            new_wm = manifest.max_watermark
            if new_wm is not None and (prev_wm is None or new_wm > prev_wm):
                pairs = _dedup_new_events(
                    stream_dir,
                    dedup_index_root,
                    prev_wm if prev_wm is not None else -1,
                    new_wm,
                    dedup_threshold,
                )
                if on_dedup_pairs:
                    on_dedup_pairs(tick, pairs)
                prev_wm = new_wm
        tick += 1
        if check_every and tick % check_every == 0:
            latest = load_latest(lake_dir)
            from_seq = max(0, latest.max_watermark - check_window)
            reports.append(
                check_and_repair(stream_dir, lake_dir, from_seq=from_seq)
            )
        if gc_keep and tick % max(1, check_every or 10) == 0:
            # bound generation growth in long-running loops (snapshot
            # rotation — the reference's backup retention analogue)
            from ..state.manifest import gc_generations

            gc_generations(lake_dir, keep=gc_keep)
        if poll_interval_s and (max_ticks is None or tick < max_ticks):
            time.sleep(poll_interval_s)
    return reports


def _dedup_new_events(
    stream_dir: str,
    index_root: str,
    prev_wm: int,
    new_wm: int,
    threshold: float,
):
    """Feed the tick's upsert contents into the incremental index;
    doc_id = commit_seq (unique per event).  Pushdown keeps the read
    to the tick's commit range."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    import ray.data

    from .dedup_index import MinHashIndex
    from .replay import event_files

    ds = ray.data.read_parquet(
        event_files(stream_dir),
        columns=["commit_seq", "content", "op"],
        filter=(
            (pads.field("commit_seq") > prev_wm)
            & (pads.field("commit_seq") <= new_wm)
        ),
    ).map_batches(
        lambda t: t.filter(pc.equal(t.column("op"), "upsert"))
        .select(["commit_seq", "content"])
        .rename_columns(["doc_id", "text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return MinHashIndex(index_root).dedup_tick(ds, threshold=threshold)


def sync_fanout(
    stream_dir: str,
    lake_dir: str,
    tables,
    *,
    max_ticks: int | None = None,
    poll_interval_s: float = 0.0,
    check_every: int = 0,
    check_window: int = 100_000,
    gc_keep: int = 5,
    on_tick: Callable | None = None,
    wire=None,
    export_out: str | None = None,
    watch: bool = False,
    watch_poll_s: float = 0.02,
    watch_timeout_s: float | None = None,
    **replay_kw,
):
    """Tail loop for the multi-table fan-out lake: each tick is one
    cross-table-atomic incremental generation (all tables advance
    together), with snapshot rotation and — like :func:`sync` — an
    optional trailing-window per-table conformance check + atomic
    repair every ``check_every`` ticks (reference cadence:
    src/ch_eth/sync.rs:348,406).  ``export_out`` publishes every tick
    as per-table Debezium JSONL feeds under one cross-table-consistent
    cursor (sources.debezium.export_fanout_tick).  ``watch=True``
    blocks each tick on a landing-zone change like :func:`sync`."""
    from ..state.manifest import gc_multi_generations, load_latest_multi
    from .check import check_and_repair_fanout
    from .fanout import replay_fanout

    tick = 0
    last = None
    reports = []
    prev_sig: tuple | None = None
    while max_ticks is None or tick < max_ticks:
        if watch:
            cur = _wait_for_change(
                stream_dir,
                prev_sig if tick > 0 else None,
                wire,
                watch_poll_s,
                watch_timeout_s,
            )
            if cur is None:
                return (last, reports) if check_every else last
            prev_sig = cur
        elif wire is not None:
            wire.land_new()
        last = replay_fanout(stream_dir, lake_dir, tables, **replay_kw)
        if on_tick:
            on_tick(tick, last)
        if export_out is not None:
            from ..sources.debezium import export_fanout_tick

            export_fanout_tick(lake_dir, export_out, tables)
        tick += 1
        if check_every and tick % check_every == 0:
            latest = load_latest_multi(lake_dir)
            from_seq = max(0, latest.max_watermark - check_window)
            reports.append(
                check_and_repair_fanout(
                    stream_dir, lake_dir, tables, from_seq=from_seq
                )
            )
        if gc_keep and tick % max(1, check_every or 10) == 0:
            gc_multi_generations(lake_dir, keep=gc_keep)
        if poll_interval_s and (max_ticks is None or tick < max_ticks):
            time.sleep(poll_interval_s)
    return (last, reports) if check_every else last
