"""Debezium JSONL wire adapter: landing a wire dump of the same
change stream must replay to a byte-identical lake (incl. the v2/v3
schema-evolution segments and reorg rollbacks)."""

import glob
import json
import os

import pyarrow.parquet as pq

from web3research_etl_ray.gen import ensure_stream
from web3research_etl_ray.oracle import oracle_fold, tables_equal
from web3research_etl_ray.pipelines.replay import lake_table, replay
from web3research_etl_ray.sources.debezium import land_debezium_jsonl


def _stream_to_jsonl(stream_dir: str, out_dir: str) -> list[str]:
    """Test-side wire serializer: parquet stream → Debezium envelopes,
    one JSONL per segment; rollbacks ride the last file."""
    os.makedirs(out_dir, exist_ok=True)
    out_files = []
    seg_files = sorted(glob.glob(os.path.join(stream_dir, "events-*.parquet")))
    for i, f in enumerate(seg_files):
        t = pq.read_table(f)
        rows = t.to_pylist()
        lines = []
        for r in rows:
            payload = {
                "repo": r["repo"], "path": r["path"], "commit": r["commit"],
                "lang": r["lang"], "content": r["content"],
            }
            if "metadata" in r and r["metadata"] is not None:
                payload["metadata"] = dict(r["metadata"])
            if r.get("size_bytes") is not None:
                payload["size_bytes"] = r["size_bytes"]
            if r["op"] == "delete":
                env = {"op": "d", "before": payload, "after": None,
                       "seq": r["commit_seq"]}
            else:
                env = {"op": "u", "before": None, "after": payload,
                       "seq": r["commit_seq"]}
            lines.append(json.dumps(env))
        out = os.path.join(out_dir, f"wire-{i:05d}.jsonl")
        with open(out, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        out_files.append(out)
    rb_path = os.path.join(stream_dir, "rollbacks.parquet")
    if os.path.exists(rb_path):
        rb = pq.read_table(rb_path).to_pylist()
        if rb:
            with open(out_files[-1], "a") as fh:
                for r in rb:
                    fh.write(json.dumps({
                        "op": "rollback", "seq": r["barrier_seq"],
                        "orphan_from": r["orphan_from"],
                        "orphan_to": r["orphan_to"],
                    }) + "\n")
    return out_files


def test_debezium_landing_replays_to_identical_lake(tmp_path):
    stream = ensure_stream(2_000)
    wire_dir = str(tmp_path / "wire")
    landed = str(tmp_path / "landed_stream")
    _stream_to_jsonl(stream, wire_dir)
    info = land_debezium_jsonl(wire_dir, landed)
    assert info["segments"] >= 1 and info["rollbacks"] >= 1

    lake_a = str(tmp_path / "lake_parquet")
    lake_b = str(tmp_path / "lake_jsonl")
    replay(stream, lake_a, num_partitions=4)
    replay(landed, lake_b, num_partitions=4)
    ta, tb = lake_table(lake_a), lake_table(lake_b)
    assert tables_equal(ta, tb)
    # and both equal the single-process oracle
    assert tables_equal(tb, oracle_fold(stream))


def test_debezium_landing_empty_metadata_and_creates(tmp_path):
    """v1-style envelopes (no metadata/size_bytes fields at all) and
    'c' creates land fine; deletes carried via before."""
    wire = tmp_path / "w.jsonl"
    envs = [
        {"op": "c", "before": None,
         "after": {"repo": "r1", "path": "a.py", "commit": "c1",
                   "lang": "py", "content": "x = 1\n"}, "seq": 0},
        {"op": "u", "before": None,
         "after": {"repo": "r1", "path": "a.py", "commit": "c2",
                   "lang": "py", "content": "x = 2\n"}, "seq": 1},
        {"op": "d",
         "before": {"repo": "r1", "path": "a.py", "commit": "c3",
                    "lang": "py"}, "after": None, "seq": 2},
        {"op": "c", "before": None,
         "after": {"repo": "r2", "path": "b.rs", "commit": "c4",
                   "lang": "rs", "content": "fn main() {}\n"}, "seq": 3},
    ]
    wire.write_text("\n".join(json.dumps(e) for e in envs) + "\n")
    landed = str(tmp_path / "stream")
    land_debezium_jsonl([str(wire)], landed)
    lake = str(tmp_path / "lake")
    replay(landed, lake, num_partitions=2)
    t = lake_table(lake)
    rows = {(r["repo"], r["path"]): r for r in t.to_pylist()}
    assert set(rows) == {("r2", "b.rs")}  # a.py ends deleted
    assert rows[("r2", "b.rs")]["content"] == "fn main() {}\n"


def test_debezium_snapshot_bootstrap_then_incremental(tmp_path):
    """Debezium's two-phase contract: an initial-snapshot file whose
    rows carry op "r" (snapshot read), then incremental files with
    c/u/d ops.  Landing the full dump and replaying must converge to
    the same lake as the canonical parquet stream — i.e. the engine
    bootstraps from a snapshot and hands off to the binlog tail with
    no special casing (op != "d" is an upsert)."""
    stream = ensure_stream(2_000)
    seg_files = sorted(glob.glob(os.path.join(stream, "events-*.parquet")))
    wire_dir = str(tmp_path / "wire")
    os.makedirs(wire_dir)

    # phase 1: snapshot = the converged state of the first segment,
    # emitted as op "r" rows (one per surviving key, at its seq)
    first = pq.read_table(seg_files[0]).to_pylist()
    latest = {}
    for r in sorted(first, key=lambda r: r["commit_seq"]):
        latest[(r["repo"], r["path"])] = r
    with open(os.path.join(wire_dir, "wire-00000.jsonl"), "w") as fh:
        for r in sorted(latest.values(), key=lambda r: r["commit_seq"]):
            if r["op"] == "delete":
                continue  # deleted keys simply absent from a snapshot
            payload = {
                "repo": r["repo"], "path": r["path"], "commit": r["commit"],
                "lang": r["lang"], "content": r["content"],
            }
            if r.get("metadata") is not None:
                payload["metadata"] = dict(r["metadata"])
            if r.get("size_bytes") is not None:
                payload["size_bytes"] = r["size_bytes"]
            fh.write(json.dumps(
                {"op": "r", "before": None, "after": payload,
                 "seq": r["commit_seq"]}) + "\n")

    # phase 2: the remaining segments as ordinary incremental envelopes
    rest_dir = str(tmp_path / "rest_stream")
    os.makedirs(rest_dir)
    for f in seg_files[1:]:
        os.symlink(f, os.path.join(rest_dir, os.path.basename(f)))
    rb = os.path.join(stream, "rollbacks.parquet")
    if os.path.exists(rb):
        os.symlink(rb, os.path.join(rest_dir, "rollbacks.parquet"))
    inc_files = _stream_to_jsonl(rest_dir, str(tmp_path / "wire_inc"))
    for i, f in enumerate(inc_files):
        os.rename(f, os.path.join(wire_dir, f"wire-{i + 1:05d}.jsonl"))

    landed = str(tmp_path / "landed")
    land_debezium_jsonl(wire_dir, landed)
    lake_wire = str(tmp_path / "lake_wire")
    lake_ref = str(tmp_path / "lake_ref")
    replay(landed, lake_wire, num_partitions=4)
    replay(stream, lake_ref, num_partitions=4)
    # snapshot drops keys that died INSIDE segment 0 and replaces
    # superseded versions with the converged row — the final lakes
    # must nonetheless agree because LWW folds to the same winners
    assert tables_equal(lake_table(lake_wire), lake_table(lake_ref))
