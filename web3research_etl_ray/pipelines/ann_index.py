"""Incremental ANN at ingest: a persistent IVF (inverted-file) index
over the embedding column that makes each tick O(new vectors) and each
query O(probed cells) — the similarity-search sibling of
``dedup_index.MinHashIndex`` and ``curate.CurateIndex``.

The batch operator (``functions/similarity.py::knn_ivf``) re-trains
and re-scans the whole corpus every run — right for one-shot search,
wrong for a CDC lake ingesting embedding ticks forever.  This module
keeps IVF state ON DISK next to the lake:

    <root>/config.json               dim / n_centroids / seed (validated per tick)
    <root>/centroids.parquet         the k×d coarse quantizer (trained once)
    <root>/cells/bucket=K/*.parquet  (vec_id, embedding) rows, one file
                                     per cell per tick (the spool pattern)

Per tick: assign each NEW vector to its nearest centroid (centroids
broadcast once via ``ray.put``) and append one file per touched cell.
Per query: only the ``n_probe`` nearest cell directories are read
(dir-level pruning — the 10^10-vector index never scans), scored with
the same vectorized per-batch matmul as the batch operator, and merged
driver-side over O(batches × Q × k) candidate rows.

Centroids are trained ONCE (first tick, bounded driver-side sample) and
frozen — the standard IVF contract (FAISS's ``train`` / ``add`` split):
retraining on a later tick would silently re-home existing vectors.
``train_centroids`` accepts an explicit matrix for callers that train
on a curated sample.

Crash note: a re-run of a half-appended tick re-adds the same
(vec_id, embedding) rows; duplicate rows only cost bytes and a
duplicate candidate, which the driver-side top-k merge collapses
(same neighbor_id, same sim → one rank slot ahead, dedup'd in
``_merge_topk``'s lexsort by neighbor).  Wrap ticks in the lake's
two-phase manifest if exactly-once index bytes matter.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..functions.similarity import (
    _batch_mat,
    _kmeans,
    _merge_topk,
    _normalize,
)
from .dedup_index import _bucket_files, _write_bucketed

_CONFIG = "config.json"
_CENTROIDS = "centroids.parquet"


class IvfIndex:
    def __init__(
        self,
        root: str,
        *,
        n_centroids: int | None = None,
        seed: int | None = None,
    ):
        """Open or create an index root.  On an existing index the
        persisted config wins; explicit arguments that CONFLICT with it
        raise (an index silently reopened with different params would
        re-home queries, not vectors).  On a fresh root, unset params
        default to 16 centroids / seed 42."""
        self.root = root
        os.makedirs(root, exist_ok=True)
        cfg_path = os.path.join(root, _CONFIG)
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
            if (n_centroids is not None and cfg["n_centroids"] != n_centroids) \
                    or (seed is not None and cfg["seed"] != seed):
                raise ValueError(
                    f"index at {root} was built with {cfg}; "
                    f"got n_centroids={n_centroids} seed={seed}"
                )
            n_centroids, seed = cfg["n_centroids"], cfg["seed"]
        self.n_centroids = 16 if n_centroids is None else n_centroids
        self.seed = 42 if seed is None else seed

    # -- quantizer ---------------------------------------------------------

    def _cent_path(self) -> str:
        return os.path.join(self.root, _CENTROIDS)

    @property
    def trained(self) -> bool:
        return os.path.exists(self._cent_path())

    def centroids(self) -> np.ndarray:
        t = pq.read_table(self._cent_path())
        return np.stack(
            [np.asarray(v, np.float64) for v in t.column("c").to_pylist()]
        )

    def train_centroids(self, mat: np.ndarray) -> np.ndarray:
        """Train and persist the coarse quantizer from an explicit
        sample matrix (rows are unnormalized embeddings).  One-shot:
        retraining an already-trained index raises — existing cell
        assignments would silently go stale."""
        if self.trained:
            raise ValueError(f"index at {self.root} is already trained")
        cent = _kmeans(_normalize(np.asarray(mat, np.float64)),
                       self.n_centroids, seed=self.seed)
        pq.write_table(
            pa.table({"c": pa.array([list(map(float, c)) for c in cent],
                                    pa.list_(pa.float64()))}),
            self._cent_path(),
        )
        with open(os.path.join(self.root, _CONFIG), "w") as f:
            json.dump({"n_centroids": self.n_centroids, "seed": self.seed,
                       "dim": int(cent.shape[1])}, f)
        return cent

    # -- ingest ------------------------------------------------------------

    def add_tick(
        self,
        ds: ray.data.Dataset,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        train_sample: int = 4096,
    ) -> int:
        """Assign the tick's vectors to cells and append them to the
        index.  First tick trains the quantizer on a bounded
        driver-side sample (fixed memory at any corpus size).

        Size-adaptive (same leg as the dedup/curate indices): a small
        tick streams to the driver and runs assignment + per-cell
        append in-process — same math, same sample (the stream
        preserves the ``limit`` order, so a fresh index trains the
        IDENTICAL centroids either way), zero extra Ray executions."""
        limit = int(os.environ.get("W3R_ANN_DRIVER_TICK_ROWS", 50_000))
        batches: list[pa.Table] = []
        nrows = 0
        small = True
        for rb in ds.iter_batches(batch_format="pyarrow", batch_size=None):
            batches.append(rb)
            nrows += rb.num_rows
            if nrows > limit:
                small = False
                break
        if small:
            t = (
                pa.concat_tables(batches, promote_options="default")
                if batches
                else None
            )
            if t is None or t.num_rows == 0:
                return 0
            if not self.trained:
                # same sample, same raw (unnormalized) float64 matrix
                # the distributed path trains on — identical centroids
                self.train_centroids(
                    _batch_mat(t.slice(0, train_sample), vec_col).astype(
                        np.float64
                    )
                )
            cent = self.centroids()
            mat = _normalize(_batch_mat(t, vec_col))
            cells = np.argmax(mat @ cent.T, axis=1).astype(np.int64)
            at = pa.table(
                {
                    "vec_id": t.column(id_col).cast(pa.int64()),
                    "embedding": t.column(vec_col),
                    "bucket": pa.array(cells, pa.int64()),
                }
            ).sort_by("bucket")
            import uuid as _uuid

            bn = at.column("bucket").to_numpy(zero_copy_only=False)
            starts = np.concatenate(
                [[0], np.flatnonzero(np.diff(bn)) + 1, [len(bn)]]
            )
            for i in range(len(starts) - 1):
                seg = at.slice(starts[i], starts[i + 1] - starts[i])
                k = int(seg.column("bucket")[0].as_py())
                d = os.path.join(self.root, "cells", f"bucket={k}")
                os.makedirs(d, exist_ok=True)
                pq.write_table(
                    seg.drop_columns(["bucket"]),
                    os.path.join(d, f"{_uuid.uuid4().hex}.parquet"),
                )
            return int(t.num_rows)

        if not self.trained:
            rows = ds.limit(train_sample).take_all()
            self.train_centroids(
                np.stack([np.asarray(r[vec_col], np.float64) for r in rows])
            )
        cent_ref = ray.put(self.centroids())

        def assign(t: pa.Table) -> pa.Table:
            cent = ray.get(cent_ref)
            mat = _normalize(_batch_mat(t, vec_col))
            cells = np.argmax(mat @ cent.T, axis=1).astype(np.int64)
            return pa.table(
                {
                    "vec_id": t.column(id_col).cast(pa.int64()),
                    "embedding": t.column(vec_col),
                    "bucket": pa.array(cells, pa.int64()),
                }
            )

        assigned = ds.map_batches(
            assign, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        n = assigned.count()
        _write_bucketed(assigned, self.root, "cells")
        return int(n)

    # -- search ------------------------------------------------------------

    def query(
        self,
        query_ids: np.ndarray,
        query_mat: np.ndarray,
        *,
        k: int = 10,
        n_probe: int = 4,
    ) -> pa.Table:
        """Top-k cosine neighbors per query, scanning ONLY the
        ``n_probe`` nearest cells of each query (union of probed cell
        dirs — dir pruning happens BEFORE any task is scheduled).
        Scoring recomputes each row's cell from the frozen centroids
        (cheaper than persisting and re-reading a cell column, and
        exactly reproducible by construction)."""
        cent = self.centroids()
        qmat = _normalize(np.asarray(query_mat, np.float64))
        qcell = np.argsort(-(qmat @ cent.T), axis=1)[:, :n_probe]
        probed = set(int(c) for c in qcell.ravel())
        files = _bucket_files(self.root, "cells", probed)
        if not files:
            return _merge_topk([], k)
        ref = ray.put(
            {"ids": np.asarray(query_ids), "mat": qmat, "cent": cent,
             "qcell": qcell}
        )

        def score(batch: pa.Table) -> pa.Table:
            q = ray.get(ref)
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            mat = _normalize(_batch_mat(batch, "embedding"))
            cells = np.argmax(mat @ q["cent"].T, axis=1)
            rows_q, rows_n, rows_s = [], [], []
            for qi in range(len(q["ids"])):
                sel = np.flatnonzero(np.isin(cells, q["qcell"][qi]))
                if not len(sel):
                    continue
                sims = mat[sel] @ q["mat"][qi]
                # k+1: a self-match inside the batch top-k must not
                # crowd out a real neighbor (driver merge re-cuts to k)
                order = np.argsort(-sims)[:k + 1]
                for j in order:
                    nid = int(ids[sel[j]])
                    if nid == int(q["ids"][qi]):
                        continue
                    rows_q.append(int(q["ids"][qi]))
                    rows_n.append(nid)
                    rows_s.append(float(sims[j]))
            return pa.table(
                {
                    "query_id": pa.array(rows_q, pa.int64()),
                    "neighbor_id": pa.array(rows_n, pa.int64()),
                    "cos_sim": pa.array(rows_s, pa.float64()),
                }
            )

        cands = (
            ray.data.read_parquet(files)
            .map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
            .take_all()
        )
        return _merge_topk(cands, k)
