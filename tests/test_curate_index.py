"""Incremental curation index: per-tick output must equal the batch
curate over everything ingested, restricted to the tick's new docs —
including exact duplicates ACROSS ticks (the index's whole point)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from web3research_etl_ray.pipelines.curate import CurateIndex, curate

GOOD = (
    "the quick brown fox jumps over the lazy dog and keeps running "
    "through the quiet forest while the morning light rises slowly "
    "over the hills and the river bends toward the old stone bridge"
)


def _docs(ids, texts):
    return ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "text": pa.array(texts, pa.string())}
        )
    )


def _mk_texts(n, seed, dup_of=None):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        words = [GOOD.split()[j] for j in rng.integers(0, 30, 45)]
        out.append(" ".join(words))
    if dup_of is not None:
        out[0] = dup_of  # exact duplicate planted across ticks
    return out


def test_ticks_equal_batch_and_cross_tick_dedup(tmp_path):
    t1 = _mk_texts(30, seed=1)
    t2 = _mk_texts(30, seed=2, dup_of=t1[3])   # dup of tick-1 text
    t2[5] = "short"                            # fails quality filter
    ids1 = list(range(30))
    ids2 = list(range(100, 130))

    idx = CurateIndex(str(tmp_path / "cidx"), quality_min=0.75,
                      n_buckets=8)
    out1 = idx.tick(_docs(ids1, t1))
    out2 = idx.tick(_docs(ids2, t2))

    batch = curate(_docs(ids1 + ids2, t1 + t2), quality_min=0.75)
    batch_tbl = pa.Table.from_pylist(batch.take_all()).sort_by("doc_id")
    want = {r["doc_id"]: (r["lang_pred"], r["n_tokens"], r["quality"])
            for r in batch_tbl.to_pylist()}
    got = {}
    for out in (out1, out2):
        for r in out.to_pylist():
            got[r["doc_id"]] = (r["lang_pred"], r["n_tokens"], r["quality"])
    assert got == want
    # the cross-tick duplicate (first doc of tick 2) must NOT re-emit
    assert ids2[0] not in got
    # the low-quality doc is filtered
    assert ids2[5] not in got


def test_config_guard(tmp_path):
    CurateIndex(str(tmp_path / "c"), quality_min=0.75)
    with pytest.raises(ValueError):
        CurateIndex(str(tmp_path / "c"), quality_min=0.5)


def test_tick_idempotent_replay_and_crash_before_commit(tmp_path):
    """Two-phase tick commit: (a) replaying a committed tick_id
    returns the stored output and does not change the index; (b) a
    crash BEFORE the rename (staged dir left behind) leaves no
    committed trace — the re-run reproduces the full output."""
    import os
    import shutil

    root = str(tmp_path / "cidx")
    idx = CurateIndex(root, quality_min=0.75, n_buckets=8)
    docs = _docs(list(range(20)), _mk_texts(20, seed=3))

    out1 = idx.tick(docs, tick_id="tick-A")
    ticks_after_1 = sorted(os.listdir(os.path.join(root, "ticks")))
    out_replay = idx.tick(docs, tick_id="tick-A")  # idempotent replay
    assert out_replay.equals(out1)
    assert sorted(os.listdir(os.path.join(root, "ticks"))) == ticks_after_1

    # crash simulation: stage a half-written tick that never committed
    staged = os.path.join(root, "staged", "tick-B")
    os.makedirs(staged, exist_ok=True)
    with open(os.path.join(staged, "output.parquet"), "wb") as f:
        f.write(b"torn")
    docs2 = _docs(list(range(100, 120)), _mk_texts(20, seed=4))
    out2 = idx.tick(docs2, tick_id="tick-B")
    assert out2.num_rows > 0  # recomputed from scratch, staged ignored
    # and the commit replaced the torn staging atomically
    import pyarrow.parquet as pq
    stored = pq.read_table(
        os.path.join(root, "ticks", "tick-B", "output.parquet")
    )
    assert stored.equals(out2)


def test_compact_preserves_dedup_and_replay(tmp_path):
    """compact() folds tick sha files into the base: later ticks must
    still drop duplicates of pre-compaction texts, replay of a folded
    tick still returns its stored output, and compacting twice is a
    no-op."""
    root = str(tmp_path / "cidx")
    idx = CurateIndex(root, quality_min=0.75, n_buckets=8)
    t1 = _mk_texts(25, seed=7)
    out1 = idx.tick(_docs(list(range(25)), t1), tick_id="A")
    info = idx.compact()
    assert info["folded_ticks"] == 1
    assert idx.compact() == {"folded_ticks": 0}

    # duplicate of a folded text must still be suppressed
    t2 = _mk_texts(25, seed=8, dup_of=t1[2])
    out2 = idx.tick(_docs(list(range(100, 125)), t2), tick_id="B")
    assert 100 not in out2.column("doc_id").to_pylist()

    # replay of the folded tick returns the stored output
    assert idx.tick(_docs(list(range(25)), t1), tick_id="A").equals(out1)


_REPO = __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))
)

_CHILD_TICK = r"""
import sys
sys.path.insert(0, {repo!r})
import numpy as np
import pyarrow as pa
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data
from web3research_etl_ray.pipelines.curate import CurateIndex

rng = np.random.default_rng(11)
words = "the quick brown fox jumps over lazy dog morning light river".split()
texts = [" ".join(rng.choice(words, size=200)) for _ in range(40000)]
docs = ray.data.from_arrow(pa.table(
    {{"doc_id": pa.array(range(40000), pa.int64()),
      "text": pa.array(texts, pa.string())}}
))
idx = CurateIndex({root!r}, quality_min=0.75, n_buckets=8)
print("START", flush=True)
out = idx.tick(docs, tick_id="kill-tick")
print("DONE", out.num_rows, flush=True)
"""


def test_sigkill_mid_curate_tick_then_retick(tmp_path):
    """REAL crash during a curation tick: SIGKILL the whole process
    group mid-tick, verify nothing committed (no ticks/ entry), then
    re-run the SAME tick in this process — the output must equal an
    uninterrupted tick on a fresh index (no lost or suppressed docs)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    root = str(tmp_path / "cidx")
    child = subprocess.Popen(
        [sys.executable, "-c",
         _CHILD_TICK.format(repo=_REPO, root=root)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        start_new_session=True,
    )
    assert "START" in child.stdout.readline()
    time.sleep(1.0)  # mid-tick (full 40k-doc tick takes several s)
    killed = child.poll() is None
    if killed:
        try:
            os.killpg(os.getpgid(child.pid), signal.SIGKILL)
        except ProcessLookupError:
            pass
        child.wait()
    assert killed, "child finished before the kill - raise the sleep"
    # two-phase commit: the killed tick must not be visible
    assert not os.path.isdir(os.path.join(root, "ticks", "kill-tick"))

    import numpy as np
    import ray.data
    from web3research_etl_ray.pipelines.curate import CurateIndex

    rng = np.random.default_rng(11)
    words = ("the quick brown fox jumps over lazy dog morning light "
             "river").split()
    texts = [" ".join(rng.choice(words, size=200)) for _ in range(40000)]
    docs = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(range(40000), pa.int64()),
         "text": pa.array(texts, pa.string())}
    ))
    out = CurateIndex(root, quality_min=0.75, n_buckets=8).tick(
        docs, tick_id="kill-tick"
    )
    fresh = CurateIndex(str(tmp_path / "fresh"), quality_min=0.75,
                        n_buckets=8).tick(docs, tick_id="kill-tick")
    assert out.equals(fresh)
    assert out.num_rows > 0


def test_curate_invariant_to_input_partitioning_and_order():
    """The batch curate must produce identical output no matter how
    the input is partitioned or ordered (batch boundaries change the
    per-batch partials, never the result)."""
    import numpy as np

    texts = _mk_texts(120, seed=21)
    texts[10] = texts[4]  # planted duplicate
    ids = list(range(120))
    base = curate(_docs(ids, texts), quality_min=0.75)
    base_t = pa.Table.from_pylist(base.take_all()).sort_by("doc_id")

    rng = np.random.default_rng(2)
    perm = rng.permutation(120)
    shuffled = _docs([ids[i] for i in perm], [texts[i] for i in perm])
    for ds in (
        shuffled,
        _docs(ids, texts).repartition(17),
        shuffled.repartition(3),
    ):
        out = pa.Table.from_pylist(
            curate(ds, quality_min=0.75).take_all()
        ).sort_by("doc_id")
        assert out.equals(base_t)


def test_compact_crash_between_renames_recovers(tmp_path):
    """A compact() killed between its two directory renames leaves
    base.old without base; reopening the index must roll the swap back
    so folded shas stay visible and cross-tick dedup keeps working
    (ADVICE r02)."""
    import os
    import shutil

    root = str(tmp_path / "cidx")
    idx = CurateIndex(root, quality_min=0.75, n_buckets=8)
    t1 = _mk_texts(25, seed=7)
    idx.tick(_docs(list(range(25)), t1), tick_id="A")
    idx.compact()  # ticks/A bucket dirs are now deleted; shas in base/

    # simulate the crash window of a SECOND compact: base moved aside,
    # staged never swapped in
    base = os.path.join(root, "base")
    os.replace(base, base + ".old")
    assert not os.path.isdir(base)

    idx2 = CurateIndex(root, quality_min=0.75, n_buckets=8)  # recovers
    assert os.path.isdir(base)
    t2 = _mk_texts(25, seed=8, dup_of=t1[2])
    out2 = idx2.tick(_docs(list(range(100, 125)), t2), tick_id="B")
    assert 100 not in out2.column("doc_id").to_pylist()

    # leftover base.old NEXT TO base (crash after swap) is dropped
    shutil.copytree(base, base + ".old")
    idx3 = CurateIndex(root, quality_min=0.75, n_buckets=8)
    assert not os.path.isdir(base + ".old")


def test_driver_tick_equals_distributed_tick(tmp_path, monkeypatch):
    """The size-adaptive driver tick must return identical rows, commit
    the same tick_id (cross-path replay compatibility), and leave the
    same logical sha-index state as the distributed path."""
    import glob

    import pyarrow.parquet as pq

    t1 = _mk_texts(25, seed=5)
    t2 = _mk_texts(25, seed=6, dup_of=t1[2])
    ids1, ids2 = list(range(25)), list(range(200, 225))

    def run(sub):
        idx = CurateIndex(str(tmp_path / sub), quality_min=0.75,
                          n_buckets=8)
        o1 = idx.tick(_docs(ids1, t1))
        o2 = idx.tick(_docs(ids2, t2))
        return idx, o1, o2

    monkeypatch.setenv("W3R_CURATE_DRIVER_TICK_ROWS", "0")
    idx_d, d1, d2 = run("dist")
    monkeypatch.delenv("W3R_CURATE_DRIVER_TICK_ROWS")
    idx_v, v1, v2 = run("drv")

    assert d1.equals(v1) and d2.equals(v2)

    def state(root):
        ticks = sorted(
            p.split("/ticks/")[1] for p in glob.glob(f"{root}/ticks/*")
        )
        shas = sorted(
            (f.split("/ticks/")[1].split("/bucket=")[0],
             int(f.split("bucket=")[1].split("/")[0]), r["text_sha256"])
            for f in glob.glob(f"{root}/ticks/*/bucket=*/*.parquet")
            for r in pq.read_table(f).to_pylist()
        )
        return ticks, shas

    assert state(idx_d.root) == state(idx_v.root)
    # cross-path replay: the driver index replays a tick the
    # distributed path committed (same tick_id scheme) as a no-op
    replay_out = idx_v.tick(_docs(ids1, t1))
    assert replay_out.equals(v1)
