"""Tail latency soak (VERDICT r03 Next #8).

The reference's sync is push-per-head (src/ch_eth/sync.rs:118-145 —
each new chain head is applied as it arrives); ours is a poll tick.
This soak bounds the resulting event→queryable latency: a 100-tick
sync over a growing stream, where each tick t lands one pre-generated
segment file (the "arriving head batch") and immediately runs
``tail_once``.  Per tick we record

* ``land→commit`` — wall seconds from the segment landing to the
  generation commit that makes every one of its events queryable
  (upper bound on any single event's queryable latency beyond its
  in-segment wait),
* backlog after the tick (must be 0: every landed event applied).

Prints one JSON line with p50/p95/max latency.  Run standalone:

    python tools/tail_latency_soak.py [n_events] [n_ticks] [--watch]

``--watch`` measures the PUSH mode instead: a producer thread lands
heads on its own clock (interval $W3R_WATCH_LAND_INTERVAL, default
0.5 s) while ``sync(watch=True)`` blocks on the landing zone, so the
reported latency is land→detect→commit per head.  An interval below
the tick wall probes overload: ticks coalesce the backlog and latency
stays bounded (measured, see BASELINE.md r05).
"""

import json
import os
import shutil
import sys
import time

import ray


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_events = int(args[0]) if len(args) > 0 else 2_000_000
    n_ticks = int(args[1]) if len(args) > 1 else 100

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from web3research_etl_ray.gen import generate_events
    from web3research_etl_ray.pipelines.replay import event_files
    from web3research_etl_ray.pipelines.tail import tail_once
    from web3research_etl_ray.state.manifest import load_latest

    src = f"/tmp/w3r_latsoak/src-n{n_events}-t{n_ticks}"
    if not os.path.exists(os.path.join(src, "gen-info.json")):
        shutil.rmtree(src, ignore_errors=True)
        generate_events(
            src, n_events=n_events, seed=42, n_segments=n_ticks
        )
    live = "/tmp/w3r_latsoak/live"
    lake = "/tmp/w3r_latsoak/lake"
    shutil.rmtree(live, ignore_errors=True)
    shutil.rmtree(lake, ignore_errors=True)
    os.makedirs(live, exist_ok=True)
    # control files (rollback ranges) are visible from tick 0 — the
    # late-rollback repair path is covered by its own tests; this soak
    # isolates steady-state tail latency
    for f in os.listdir(src):
        if not f.startswith("events-"):
            shutil.copy(os.path.join(src, f), os.path.join(live, f))

    lat = []
    segs = event_files(src)
    if "--watch" in sys.argv:
        # TRUE push-tail latency: a producer thread lands heads on its
        # own clock while sync(watch=True) blocks on the landing zone —
        # per-head latency = (commit covering its max seq) − (land
        # time), so the number INCLUDES detection, not just the tick.
        import threading

        import pyarrow.parquet as pqt

        from web3research_etl_ray.pipelines.tail import sync

        seg_max = {
            os.path.basename(s): int(
                pqt.read_table(s, columns=["commit_seq"])
                .column("commit_seq")[-1]
                .as_py()
            )
            for s in segs[:n_ticks]
        }
        land_t: dict[str, float] = {}
        done_t: dict[str, float] = {}

        # land interval (s): above the tick wall ⇒ steady-state
        # detect+commit latency per head; below it ⇒ overload mode
        # (ticks coalesce the backlog; latency = queueing, bounded)
        interval = float(os.environ.get("W3R_WATCH_LAND_INTERVAL", "0.5"))

        def producer():
            for s in segs[:n_ticks]:
                b = os.path.basename(s)
                shutil.copy(s, os.path.join(live, ".tmp-" + b))
                os.replace(
                    os.path.join(live, ".tmp-" + b), os.path.join(live, b)
                )
                land_t[b] = time.perf_counter()
                time.sleep(interval)

        def on_tick(_tick, manifest):
            now = time.perf_counter()
            wm = manifest.max_watermark
            for b, mx in seg_max.items():
                if b not in done_t and b in land_t and wm >= mx:
                    done_t[b] = now

        t = threading.Thread(target=producer)
        t.start()
        sync(
            live,
            lake,
            watch=True,
            max_ticks=n_ticks,
            watch_timeout_s=10.0,
            on_tick=on_tick,
            num_partitions=64,
        )
        t.join()
        assert set(done_t) == set(seg_max), (
            f"unapplied heads: {sorted(set(seg_max) - set(done_t))[:5]}"
        )
        lat = [done_t[b] - land_t[b] for b in seg_max]
    else:
        for i, seg in enumerate(segs[:n_ticks]):
            shutil.copy(seg, os.path.join(live, os.path.basename(seg)))
            t0 = time.perf_counter()
            tail_once(live, lake, num_partitions=64)
            lat.append(time.perf_counter() - t0)
            m = load_latest(lake)
            assert m is not None

    # backlog check: every non-orphaned event applied
    import pyarrow.dataset as pads

    stream_max = max(
        pads.dataset(f).to_table(columns=["commit_seq"])["commit_seq"]
        .to_pylist()[-1]
        for f in event_files(live)
    )
    lake_wm = load_latest(lake).max_watermark
    lat_sorted = sorted(lat)

    def pct(p):
        return round(lat_sorted[min(len(lat) - 1, int(p * len(lat)))], 3)

    print(
        json.dumps(
            {
                "metric": (
                    "tail event->queryable latency "
                    + (
                        "(watch mode: land->detect->commit)"
                        if "--watch" in sys.argv
                        else "(land->commit)"
                    )
                ),
                "n_events": n_events,
                "n_ticks": len(lat),
                "p50_s": pct(0.50),
                "p95_s": pct(0.95),
                "max_s": round(lat_sorted[-1], 3),
                "first_tick_s": round(lat[0], 3),
                "backlog_zero": bool(lake_wm >= stream_max),
                "lake_watermark": int(lake_wm),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
