"""Two-node cluster evidence (VERDICT r03 Next #7).

Everything else in BASELINE.md runs under ``ray.init(address="local")``
(the sandbox rule).  The north rule, however, is a multi-NODE job, so
this script simulates the smallest real cluster the sandbox allows:
two ``ray start`` raylets on this box (head + worker, each with its own
plasma object store), a driver that connects via ``ray.init(address=
...)``, and one 10M-event replay.  It then asserts

* tasks genuinely ran on BOTH nodes (``W3R_NODE_TRACE``: map and merge
  tasks touch one marker per raylet node id — the dashboard state API
  is disabled in this sandbox),
* the lake equals the single-process oracle fold — i.e. the spool
  exchange and the two-phase manifest commit are correct when map and
  merge tasks live in different object stores / processes.

Run:  python tools/two_node_replay.py [n_events]
Requires: no other ray session on the box.  Cleans up with ray stop.
"""

import json
import os
import shutil
import subprocess
import sys
import time


def sh(cmd: list[str]) -> str:
    return subprocess.run(
        cmd, capture_output=True, text=True, check=True
    ).stdout


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # the preset 'local' would bypass the cluster
    subprocess.run(["ray", "stop", "--force"], capture_output=True, env=env)
    try:
        subprocess.run(
            [
                "ray", "start", "--head", "--num-cpus=4",
                "--port=6379", "--include-dashboard=false",
                "--disable-usage-stats",
            ],
            check=True, capture_output=True, env=env,
        )
        subprocess.run(
            [
                "ray", "start", "--address=127.0.0.1:6379", "--num-cpus=4",
                "--disable-usage-stats",
            ],
            check=True, capture_output=True, env=env,
        )
        time.sleep(2)

        env["W3R_NODE_TRACE"] = trace_dir = "/tmp/w3r_twonode_trace"
        shutil.rmtree(trace_dir, ignore_errors=True)
        driver = f"""
import json, os, shutil, time
import ray
ray.init(
    address="127.0.0.1:6379", logging_level="ERROR",
    runtime_env={{"env_vars": {{"W3R_NODE_TRACE": "{trace_dir}"}}}},
)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
nodes = [n for n in ray.nodes() if n["Alive"]]
assert len(nodes) == 2, nodes
from web3research_etl_ray.gen import ensure_stream
from web3research_etl_ray.pipelines.replay import replay, lake_table
from web3research_etl_ray.oracle import oracle_fold, tables_equal
stream = ensure_stream({n_events})
lake = "/tmp/w3r_twonode_lake"
shutil.rmtree(lake, ignore_errors=True)
t0 = time.perf_counter()
m = replay(stream, lake, num_partitions=64)
wall = time.perf_counter() - t0
# which raylets executed map/merge tasks: node-trace markers
marks = sorted(os.listdir("{trace_dir}"))
map_nodes = {{m.split("-", 1)[1] for m in marks if m.startswith("map-")}}
merge_nodes = {{m.split("-", 1)[1] for m in marks if m.startswith("merge-")}}
small = {n_events} <= 1_000_000
result = {{
    "wall_s": round(wall, 2),
    "n_events": {n_events},
    "events_per_sec": round({n_events} / wall, 1),
    "alive_nodes": len(nodes),
    "map_task_nodes": len(map_nodes),
    "merge_task_nodes": len(merge_nodes),
    "lake_rows": m.totals()["rows"],
}}
if small:
    result["lake_equals_oracle"] = tables_equal(
        lake_table(lake), oracle_fold(stream))
print("RESULT " + json.dumps(result))
ray.shutdown()
"""
        out = subprocess.run(
            [sys.executable, "-c", driver],
            capture_output=True, text=True, env=env, cwd="/root/repo",
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line[len("RESULT "):])
                break
        else:
            sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
            sys.exit(1)
    finally:
        subprocess.run(["ray", "stop", "--force"], capture_output=True, env=env)


if __name__ == "__main__":
    main()
