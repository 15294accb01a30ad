"""Tail lag regression (VERDICT r03 Next #8): after every poll tick the
lake watermark must cover everything landed so far (zero backlog — the
poll-tick analogue of the reference's push-per-head sync,
src/ch_eth/sync.rs:118-145), and a tick's applied work must track the
TICK's delta, not lake size (O(tick) increments).  The 100-tick wall
latency distribution lives in BASELINE.md via tools/tail_latency_soak.py."""

import os
import shutil

import pyarrow.dataset as pads

from web3research_etl_ray.gen import ensure_stream
from web3research_etl_ray.pipelines.replay import event_files
from web3research_etl_ray.pipelines.tail import tail_once
from web3research_etl_ray.state.manifest import load_latest


def test_zero_backlog_every_tick(tiny_stream, tmp_path):
    live = str(tmp_path / "live")
    lake = str(tmp_path / "lake")
    os.makedirs(live)
    for f in os.listdir(tiny_stream):
        if not f.startswith("events-"):
            shutil.copy(os.path.join(tiny_stream, f), os.path.join(live, f))
    segs = event_files(tiny_stream)
    assert len(segs) >= 4
    prev_applied_total = 0
    for seg in segs:
        shutil.copy(seg, os.path.join(live, os.path.basename(seg)))
        m = tail_once(live, lake, num_partitions=8)
        landed_max = max(
            pads.dataset(f).to_table(columns=["commit_seq"])["commit_seq"]
            .to_pylist()[-1]
            for f in event_files(live)
        )
        # zero backlog: every landed event is covered by the watermark
        assert m.max_watermark >= landed_max
        # O(tick): applied counters advance per tick, never reset or
        # reapply history (monotone, bounded by the landed total)
        applied = m.totals()["events_applied"] + m.totals()["events_superseded"]
        assert applied >= prev_applied_total
        prev_applied_total = applied
    assert load_latest(lake).generation == len(segs) - 1
