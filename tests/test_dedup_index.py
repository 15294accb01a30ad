"""Incremental near-dup index: per-tick results must equal the batch
operator run over everything ingested so far, restricted to pairs
involving the tick's docs — the O(new docs) path with no loss."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

BASE = (
    "the quick brown fox jumps over the lazy dog and keeps running through "
    "the quiet forest while the morning light rises slowly over the hills"
)


def _docs(ids, texts):
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _pairs_set(t: pa.Table):
    return set(zip(t["id_a"].to_pylist(), t["id_b"].to_pylist()))


def test_incremental_index_matches_batch_operator(tmp_path):
    from web3research_etl_ray.functions.dedup import minhash_lsh_pairs
    from web3research_etl_ray.pipelines.dedup_index import MinHashIndex

    texts_a = [
        BASE,
        BASE + " extra tail words here",  # near-dup of 0 (within tick 1)
        "completely different content about database engines and arrow "
        "record batches flowing through a streaming execution engine",
        "yet another unrelated document discussing parquet row groups "
        "predicate pushdown and column pruning at scan time",
    ]
    ids_a = [0, 1, 2, 3]
    # tick 2: a near-dup of an OLD doc, an internal near-dup pair, and
    # an unrelated doc
    texts_b = [
        BASE + " with a small suffix change",            # ~ dup of 0/1
        "fresh corpus text about deterministic replay engines and "
        "manifest generations in a parquet lake with watermarks",
        "fresh corpus text about deterministic replay engines and "
        "manifest generations in a parquet lake with watermarks today",
        "isolated text mentioning nothing in common with anything else "
        "quantum banana harvest telescope",
    ]
    ids_b = [100, 101, 102, 103]

    ds_a = ray.data.from_arrow(_docs(ids_a, texts_a))
    ds_b = ray.data.from_arrow(_docs(ids_b, texts_b))
    ds_ab = ray.data.from_arrow(_docs(ids_a + ids_b, texts_a + texts_b))

    idx = MinHashIndex(str(tmp_path / "idx"))

    got1 = idx.dedup_tick(ds_a, threshold=0.3)
    want1 = minhash_lsh_pairs(ds_a, threshold=0.3)
    assert _pairs_set(got1) == _pairs_set(want1)
    assert (0, 1) in _pairs_set(got1)

    got2 = idx.dedup_tick(ds_b, threshold=0.3)
    batch_all = minhash_lsh_pairs(ds_ab, threshold=0.3)
    b_ids = set(ids_b)
    want2 = {
        p for p in _pairs_set(batch_all) if p[0] in b_ids or p[1] in b_ids
    }
    assert _pairs_set(got2) == want2
    assert (101, 102) in _pairs_set(got2)        # internal to tick 2
    assert any(a in (0, 1) and b == 100 for a, b in _pairs_set(got2))  # cross-tick
    # old-old pairs are never re-reported
    assert (0, 1) not in _pairs_set(got2)
    # est_jaccard values match the batch operator's
    est_batch = {
        (r["id_a"], r["id_b"]): r["est_jaccard"] for r in batch_all.to_pylist()
    }
    for r in got2.to_pylist():
        assert r["est_jaccard"] == pytest.approx(est_batch[(r["id_a"], r["id_b"])])


def test_randomized_incremental_equals_batch(tmp_path):
    """Fuzz the tick-equivalence invariant: random corpora with random
    duplicate planting, split into a RANDOM number of ticks — the
    union of per-tick outputs must equal the batch operator on the
    full corpus, exactly (pairs and est values)."""
    from web3research_etl_ray.functions.dedup import minhash_lsh_pairs
    from web3research_etl_ray.pipelines.dedup_index import MinHashIndex

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)]
    for trial in range(3):
        n = int(rng.integers(12, 40))
        texts, ids = [], []
        for i in range(n):
            words = list(rng.choice(vocab, size=int(rng.integers(8, 40))))
            if i > 0 and rng.random() < 0.3:  # mutate an earlier doc
                src = texts[int(rng.integers(len(texts)))].split()
                words = src.copy()
                if words:
                    words[int(rng.integers(len(words)))] = str(rng.choice(vocab))
            texts.append(" ".join(words))
            ids.append(100 * trial + i)

        batch = minhash_lsh_pairs(
            ray.data.from_arrow(_docs(ids, texts)), threshold=0.4
        )
        want = {
            (r["id_a"], r["id_b"]): r["est_jaccard"] for r in batch.to_pylist()
        }

        idx = MinHashIndex(str(tmp_path / f"idx{trial}"))
        n_ticks = int(rng.integers(1, 5))
        cuts = sorted(rng.choice(range(1, n), size=n_ticks - 1, replace=False)) if n_ticks > 1 else []
        bounds = [0] + [int(c) for c in cuts] + [n]
        got = {}
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            t = idx.dedup_tick(
                ray.data.from_arrow(_docs(ids[lo:hi], texts[lo:hi])),
                threshold=0.4,
            )
            for r in t.to_pylist():
                got[(r["id_a"], r["id_b"])] = r["est_jaccard"]
        assert set(got) == set(want), f"trial {trial}: pair sets differ"
        for k in want:
            assert got[k] == pytest.approx(want[k]), f"trial {trial}: est differs at {k}"


def test_compact_merges_files_and_preserves_results(tmp_path):
    import glob

    from web3research_etl_ray.functions.dedup import minhash_lsh_pairs
    from web3research_etl_ray.pipelines.dedup_index import MinHashIndex

    idx = MinHashIndex(str(tmp_path / "idx"))
    t1 = [BASE, "unrelated text about arrow buffers and record batches"]
    t2 = ["more unrelated text mentioning shuffles and spills to disk"]
    t3 = [BASE + " with a trailing addition"]
    idx.dedup_tick(ray.data.from_arrow(_docs([0, 1], t1)), threshold=0.3)
    idx.dedup_tick(ray.data.from_arrow(_docs([2], t2)), threshold=0.3)
    idx.compact()
    for d in glob.glob(str(tmp_path / "idx" / "*" / "bucket=*")):
        assert len(glob.glob(d + "/*.parquet")) == 1
    got = idx.dedup_tick(ray.data.from_arrow(_docs([3], t3)), threshold=0.3)
    batch = minhash_lsh_pairs(
        ray.data.from_arrow(_docs([0, 1, 2, 3], t1 + t2 + t3)), threshold=0.3
    )
    want = {p for p in _pairs_set(batch) if 3 in p}
    assert _pairs_set(got) == want and (0, 3) in want


def test_duplicate_index_rows_are_benign(tmp_path):
    """Crash-mid-append leaves duplicate band/sig files; every reader
    must tolerate them (candidate runs dedup ids, sig attach picks one
    row per doc) — simulate by literally doubling the tick's files."""
    import glob
    import shutil as sh

    from web3research_etl_ray.functions.dedup import minhash_lsh_pairs
    from web3research_etl_ray.pipelines.dedup_index import MinHashIndex

    t1 = [BASE, "unrelated text about arrow buffers and record batches"]
    t2 = [BASE + " with a trailing addition"]

    idx = MinHashIndex(str(tmp_path / "idx"))
    idx.dedup_tick(ray.data.from_arrow(_docs([0, 1], t1)), threshold=0.3)
    for f in glob.glob(str(tmp_path / "idx" / "*" / "bucket=*" / "*.parquet")):
        sh.copy(f, f.replace(".parquet", "-dup.parquet"))
    got = idx.dedup_tick(ray.data.from_arrow(_docs([2], t2)), threshold=0.3)
    batch = minhash_lsh_pairs(
        ray.data.from_arrow(_docs([0, 1, 2], t1 + t2)), threshold=0.3
    )
    want = {p for p in _pairs_set(batch) if 2 in p}
    assert _pairs_set(got) == want and (0, 2) in want


def test_index_param_mismatch_raises(tmp_path):
    from web3research_etl_ray.pipelines.dedup_index import MinHashIndex

    MinHashIndex(str(tmp_path / "idx"), num_perm=64)
    with pytest.raises(ValueError):
        MinHashIndex(str(tmp_path / "idx"), num_perm=32)


def test_sync_with_inline_dedup(tmp_path):
    """CDC tail loop with dedup_index_root: each tick's newly applied
    upsert contents probe the persistent index; a tick-2 near-dup of a
    tick-1 file is reported as a cross-tick pair keyed by commit_seq."""
    import os

    import pyarrow.parquet as pq

    from web3research_etl_ray.pipelines.tail import sync
    from web3research_etl_ray.schema import ROLLBACK_SCHEMA

    stream = str(tmp_path / "stream")
    os.makedirs(stream)
    pq.write_table(
        pa.table(
            {
                "barrier_seq": pa.array([], pa.int64()),
                "orphan_from": pa.array([], pa.int64()),
                "orphan_to": pa.array([], pa.int64()),
            },
            schema=ROLLBACK_SCHEMA,
        ),
        os.path.join(stream, "rollbacks.parquet"),
    )

    def seg(name, rows):
        seqs = [s for s, _ in rows]
        pq.write_table(
            pa.table(
                {
                    "repo": pa.array(["r1"] * len(rows), pa.string()),
                    "path": pa.array([f"src/f{s}.py" for s in seqs], pa.string()),
                    "commit": pa.array([f"c{s}" for s in seqs], pa.string()),
                    "lang": pa.array(["py"] * len(rows), pa.string()),
                    "content": pa.array([c for _, c in rows], pa.string()),
                    "commit_seq": pa.array(seqs, pa.int64()),
                    "op": pa.array(["upsert"] * len(rows), pa.string()),
                }
            ),
            os.path.join(stream, name),
        )

    unrel_a = "import os\nvalue = os.environ.get('KEY') or compute_default(1, 2, 3)\n" * 3
    unrel_b = "class Widget:\n    def render(self):\n        return template.format(self.name)\n" * 3
    unrel_c = "SELECT col_one, col_two FROM some_table WHERE col_three > 42 ORDER BY col_one\n" * 3
    seg("events-00000.parquet", [(0, BASE), (1, unrel_a), (2, unrel_b)])

    lake = str(tmp_path / "lake")
    idx_root = str(tmp_path / "dedup_idx")
    got: list = []
    sync(
        stream,
        lake,
        max_ticks=1,
        num_partitions=4,
        dedup_index_root=idx_root,
        dedup_threshold=0.3,
        on_dedup_pairs=lambda t, p: got.append(p),
    )
    assert len(got) == 1 and got[0].num_rows == 0  # no dups in tick 1

    seg("events-00001.parquet", [(3, BASE + " extra tail words"), (4, unrel_c)])
    sync(
        stream,
        lake,
        max_ticks=1,
        num_partitions=4,
        dedup_index_root=idx_root,
        dedup_threshold=0.3,
        on_dedup_pairs=lambda t, p: got.append(p),
    )
    assert len(got) == 2
    assert _pairs_set(got[1]) == {(0, 3)}  # cross-tick near-dup by commit_seq


def test_empty_tick_is_safe(tmp_path):
    from web3research_etl_ray.pipelines.dedup_index import MinHashIndex

    idx = MinHashIndex(str(tmp_path / "idx"))
    out = idx.dedup_tick(
        ray.data.from_arrow(_docs([], [])), threshold=0.5
    )
    assert out.num_rows == 0


def test_driver_tick_equals_distributed_tick(tmp_path, monkeypatch):
    """The size-adaptive driver tick must return the same pairs AND
    leave the same logical index state (band rows, sig rows) as the
    distributed path, tick by tick."""
    import glob

    import pyarrow.parquet as pq

    from web3research_etl_ray.pipelines.dedup_index import MinHashIndex

    texts_a = [
        BASE,
        BASE + " extra tail words here",
        "completely different content about database engines and arrow "
        "record batches flowing through a streaming execution engine",
    ]
    texts_b = [
        BASE + " with a small suffix change",
        "fresh corpus text about deterministic replay engines and "
        "manifest generations in a parquet lake with watermarks",
        "fresh corpus text about deterministic replay engines and "
        "manifest generations in a parquet lake with watermarks today",
    ]

    def run(sub):
        idx = MinHashIndex(str(tmp_path / sub))
        outs = []
        outs.append(
            idx.dedup_tick(ray.data.from_arrow(_docs([0, 1, 2], texts_a)))
        )
        outs.append(
            idx.dedup_tick(
                ray.data.from_arrow(_docs([100, 101, 102], texts_b))
            )
        )
        return idx, outs

    def index_state(root):
        state = {}
        for sub, cols in (("bands", ["band_key", "doc_id"]),
                          ("sigs", ["doc_id", "sig"])):
            rows = []
            for f in glob.glob(f"{root}/{sub}/bucket=*/*.parquet"):
                b = int(f.split("bucket=")[1].split("/")[0])
                t = pq.read_table(f, columns=cols)
                rows += [(b, *r.values()) for r in t.to_pylist()]
            state[sub] = sorted(rows)
        return state

    monkeypatch.setenv("W3R_DEDUP_DRIVER_TICK_ROWS", "0")  # force distributed
    idx_d, out_d = run("dist")
    monkeypatch.delenv("W3R_DEDUP_DRIVER_TICK_ROWS")
    idx_v, out_v = run("drv")

    for td, tv in zip(out_d, out_v):
        assert _pairs_set(td) == _pairs_set(tv)
        # est values identical too (same estimator over same sigs)
        dd = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in td.to_pylist()}
        dv = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in tv.to_pylist()}
        assert dd == dv
    assert index_state(idx_d.root) == index_state(idx_v.root)
