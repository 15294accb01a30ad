"""44-table (Tron-width) fan-out soak (VERDICT r03 Next #3).

Replays a 10M-event stream through :func:`pipelines.wide.
tron_width_tables` (44 tables — the reference's widest shape,
src/ch_tron/init.rs:76-214), with

* a partial replay (``upto_seq``) then resume — the resumed lake must
  equal a one-shot replay TABLE BY TABLE (multi-manifest watermark
  resume at width),
* a ``check_fanout`` conformance pass over sampled tables,
* wall/throughput reporting (events/s and table-rows/s).

Run:  python tools/wide_fanout_soak.py [n_events]
"""

import json
import os
import shutil
import sys
import time

import ray


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from web3research_etl_ray.gen import ensure_stream
    from web3research_etl_ray.pipelines.fanout import fanout_table, replay_fanout
    from web3research_etl_ray.pipelines.wide import tron_width_tables
    from web3research_etl_ray.state.manifest import load_latest_multi

    stream = ensure_stream(n_events)
    tables = tron_width_tables()

    # --- one-shot ----------------------------------------------------
    lake_a = "/tmp/w3r_wide_a"
    shutil.rmtree(lake_a, ignore_errors=True)
    t0 = time.perf_counter()
    m = replay_fanout(stream, lake_a, tables, num_partitions=128)
    wall = time.perf_counter() - t0
    total_rows = sum(
        sum(p.num_rows for p in ts.partitions.values())
        for ts in m.tables.values()
    )

    # --- partial + resume == one-shot, per table ---------------------
    lake_b = "/tmp/w3r_wide_b"
    shutil.rmtree(lake_b, ignore_errors=True)
    half = n_events // 2
    t0 = time.perf_counter()
    replay_fanout(stream, lake_b, tables, num_partitions=128, upto_seq=half)
    replay_fanout(stream, lake_b, tables, num_partitions=128)
    wall_resumed = time.perf_counter() - t0
    mismatch = []
    for name in sorted(m.tables):
        ta = fanout_table(lake_a, name)
        tb = fanout_table(lake_b, name)
        if ta.num_rows != tb.num_rows:
            mismatch.append((name, ta.num_rows, tb.num_rows))
            continue
        cols = sorted(ta.column_names)
        ra = sorted(
            tuple(str(r[c]) for c in cols) for r in ta.to_pylist()
        )
        rb = sorted(
            tuple(str(r[c]) for c in cols) for r in tb.to_pylist()
        )
        if ra != rb:
            mismatch.append((name, "values"))

    # --- conformance over a sample of tables -------------------------
    from web3research_etl_ray.pipelines.check import check_fanout

    sample_names = {
        "repo_files", "w_valuations", "w_addresses", "w_refs",
        "w_repo_activity", "w_shard_0",
    }
    sample = [ft for ft in tables if ft.spec.name in sample_names]
    reports = check_fanout(stream, lake_a, sample)
    bad = {n: vars(r) for n, r in reports.items() if not r.ok}

    print(
        json.dumps(
            {
                "metric": "44-table fanout replay @ 10M",
                "n_events": n_events,
                "n_tables": len(m.tables),
                "wall_s": round(wall, 2),
                "events_per_sec": round(n_events / wall, 1),
                "table_rows": total_rows,
                "table_rows_per_sec": round(total_rows / wall, 1),
                "wall_resumed_s": round(wall_resumed, 2),
                "resume_equals_oneshot": not mismatch,
                "mismatched_tables": mismatch[:5],
                "conformance_ok": not bad,
                "conformance_bad": bad,
                "generation": load_latest_multi(lake_a).generation,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
