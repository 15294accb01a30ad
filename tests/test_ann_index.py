"""IvfIndex: persistent incremental IVF over the embedding column.

Contracts tested:
  * exactness-within-probe — the distributed scan over probed cells
    returns EXACTLY the numpy answer restricted to those cells (same
    centroids, same tie-break);
  * incremental == one-shot — two ticks with a shared quantizer give
    the same query results as one tick over the union;
  * dir pruning — a query touches only its probed cell directories;
  * frozen quantizer — retraining raises; config mismatch raises;
  * recall — on a clustered fixture, probing recovers the planted
    neighbors.
"""

import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from web3research_etl_ray.functions.similarity import _normalize
from web3research_etl_ray.pipelines.ann_index import IvfIndex


def _mk(n=400, dim=16, clusters=4, seed=3):
    rng = np.random.default_rng(seed)
    cent = rng.standard_normal((clusters, dim)) * 4
    mat = cent[np.arange(n) % clusters] + rng.standard_normal((n, dim)) * 0.2
    return mat


def _ds(mat, ids=None):
    ids = np.arange(len(mat)) if ids is None else ids
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in mat],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )


def _expected(idx, mat, all_ids, qids, qmat, k, n_probe):
    """Single-process reference: same centroids, same probe set, same
    (-sim, neighbor_id) tie-break as _merge_topk."""
    cent = idx.centroids()
    m = _normalize(np.asarray(mat, np.float64))
    cells = np.argmax(m @ cent.T, axis=1)
    qm = _normalize(np.asarray(qmat, np.float64))
    qcell = np.argsort(-(qm @ cent.T), axis=1)[:, :n_probe]
    rows = []
    for qi in range(len(qids)):
        sel = np.flatnonzero(np.isin(cells, qcell[qi]))
        sel = sel[all_ids[sel] != qids[qi]]
        sims = m[sel] @ qm[qi]
        order = np.lexsort((all_ids[sel], -sims))[:k]
        for r, j in enumerate(order):
            rows.append((int(qids[qi]), int(all_ids[sel[j]]), r + 1))
    return rows


def test_query_exact_within_probed_cells(tmp_path):
    mat = _mk()
    idx = IvfIndex(str(tmp_path / "ivf"), n_centroids=8)
    idx.add_tick(_ds(mat))
    qids = np.array([0, 1, 2], np.int64)
    out = idx.query(qids, mat[:3], k=5, n_probe=2)
    got = list(
        zip(out["query_id"].to_pylist(), out["neighbor_id"].to_pylist(),
            out["rank"].to_pylist())
    )
    want = _expected(idx, mat, np.arange(len(mat)), qids, mat[:3], 5, 2)
    assert sorted(got) == sorted(want)


def test_incremental_equals_one_shot(tmp_path):
    mat = _mk(n=300)
    qids = np.array([5, 6], np.int64)

    one = IvfIndex(str(tmp_path / "one"), n_centroids=8)
    one.train_centroids(mat[:128])
    one.add_tick(_ds(mat))

    two = IvfIndex(str(tmp_path / "two"), n_centroids=8)
    two.train_centroids(mat[:128])
    two.add_tick(_ds(mat[:150], np.arange(150)))
    two.add_tick(_ds(mat[150:], np.arange(150, 300)))

    a = one.query(qids, mat[5:7], k=7, n_probe=3).sort_by(
        [("query_id", "ascending"), ("rank", "ascending")]
    )
    b = two.query(qids, mat[5:7], k=7, n_probe=3).sort_by(
        [("query_id", "ascending"), ("rank", "ascending")]
    )
    # ids and ranks are identical; sims agree to the last few ulps
    # (BLAS matvec blocking varies with the candidate-matrix height,
    # so scoring the same row inside different-size batches can move
    # the final bit)
    for col in ("query_id", "neighbor_id", "rank"):
        assert a[col].to_pylist() == b[col].to_pylist()
    np.testing.assert_allclose(
        a["cos_sim"].to_numpy(), b["cos_sim"].to_numpy(), rtol=1e-12
    )


def test_dir_pruning_probes_only_selected_cells(tmp_path):
    mat = _mk()
    idx = IvfIndex(str(tmp_path / "ivf"), n_centroids=8)
    idx.add_tick(_ds(mat))
    cent = idx.centroids()
    qm = _normalize(np.asarray(mat[:1], np.float64))
    probe = int(np.argmax(qm @ cent.T, axis=1)[0])
    # every neighbor the 1-probe query returns must live in that cell
    out = idx.query(np.array([10**9], np.int64), mat[:1], k=50, n_probe=1)
    m = _normalize(np.asarray(mat, np.float64))
    cells = np.argmax(m @ cent.T, axis=1)
    in_cell = set(np.flatnonzero(cells == probe).tolist())
    assert set(out["neighbor_id"].to_pylist()) <= in_cell
    # and the probed cell dir is the only one the file listing touches
    from web3research_etl_ray.pipelines.dedup_index import _bucket_files

    files = _bucket_files(str(tmp_path / "ivf"), "cells", {probe})
    assert files and all(f"bucket={probe}" in f for f in files)


def test_frozen_quantizer_and_config_guard(tmp_path):
    mat = _mk(n=100)
    idx = IvfIndex(str(tmp_path / "ivf"), n_centroids=4)
    idx.add_tick(_ds(mat))
    with pytest.raises(ValueError, match="already trained"):
        idx.train_centroids(mat[:10])
    with pytest.raises(ValueError, match="was built with"):
        IvfIndex(str(tmp_path / "ivf"), n_centroids=8)


def test_cli_ann_tick_and_query(tmp_path):
    """ann-tick / ann-query round trip: two ticks, a query file, and a
    parquet result with (query_id, neighbor_id, cos_sim, rank)."""
    import pyarrow.parquet as pq

    from web3research_etl_ray.__main__ import main

    mat = _mk(n=120)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(120), pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in mat], pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(t.slice(0, 60), str(tmp_path / "t1.parquet"))
    pq.write_table(t.slice(60), str(tmp_path / "t2.parquet"))
    pq.write_table(t.slice(0, 3), str(tmp_path / "q.parquet"))
    idx = str(tmp_path / "ivf")
    assert main(["ann-tick", "--vectors", str(tmp_path / "t1.parquet"),
                 "--index", idx, "--centroids", "8"]) == 0
    assert main(["ann-tick", "--vectors", str(tmp_path / "t2.parquet"),
                 "--index", idx, "--centroids", "8"]) == 0
    out = str(tmp_path / "res.parquet")
    assert main(["ann-query", "--queries", str(tmp_path / "q.parquet"),
                 "--index", idx, "--k", "5", "--out", out]) == 0
    res = pq.read_table(out)
    assert res.column_names == ["query_id", "neighbor_id", "cos_sim", "rank"]
    assert set(res["query_id"].to_pylist()) == {0, 1, 2}
    assert res.num_rows == 15  # 3 queries x k=5


def test_recall_on_clustered_fixture(tmp_path):
    """Planted twin vectors: with enough probes, every twin is found
    at rank 1."""
    mat = _mk(n=200, clusters=4)
    twins = mat[:10] + 1e-4
    full = np.vstack([mat, twins])
    ids = np.arange(len(full))
    idx = IvfIndex(str(tmp_path / "ivf"), n_centroids=8)
    idx.add_tick(_ds(full, ids))
    out = idx.query(ids[:10], full[:10], k=1, n_probe=4)
    hit = {
        q: n for q, n in zip(out["query_id"].to_pylist(),
                             out["neighbor_id"].to_pylist())
    }
    assert all(hit[i] == 200 + i for i in range(10))


def test_driver_tick_equals_distributed_tick(tmp_path, monkeypatch):
    """Size-adaptive ANN tick: the driver leg must train identical
    centroids (same sample, same dtype), land identical cell
    assignments, and answer queries identically to the distributed
    path."""
    import glob

    import pyarrow.parquet as pq

    mat = _mk(n=120, clusters=4)
    ids = np.arange(120)

    def run(sub):
        idx = IvfIndex(str(tmp_path / sub), n_centroids=8)
        idx.add_tick(_ds(mat[:60], ids[:60]))
        idx.add_tick(_ds(mat[60:], ids[60:]))
        return idx

    monkeypatch.setenv("W3R_ANN_DRIVER_TICK_ROWS", "0")
    idx_d = run("dist")
    monkeypatch.delenv("W3R_ANN_DRIVER_TICK_ROWS")
    idx_v = run("drv")

    assert np.allclose(idx_d.centroids(), idx_v.centroids())

    def cells(root):
        out = {}
        for f in glob.glob(f"{root}/cells/bucket=*/*.parquet"):
            b = int(f.split("bucket=")[1].split("/")[0])
            for r in pq.read_table(f, columns=["vec_id"]).to_pylist():
                out[r["vec_id"]] = b
        return out

    assert cells(idx_d.root) == cells(idx_v.root)
    qd = idx_d.query(ids[:5], mat[:5], k=3, n_probe=4)
    qv = idx_v.query(ids[:5], mat[:5], k=3, n_probe=4)
    assert qd.sort_by([("query_id", "ascending"),
                       ("neighbor_id", "ascending")]).equals(
        qv.sort_by([("query_id", "ascending"),
                    ("neighbor_id", "ascending")])
    )
