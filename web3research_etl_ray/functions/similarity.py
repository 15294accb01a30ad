"""Similarity search over an embedding column (list<float>).

- ``knn_brute``: baseline exact cosine top-k.  The query matrix is
  broadcast ONCE (``ray.put`` → read per task), each batch does one
  numpy float64 matmul against it and emits only its local top-k
  candidates; the driver merges #batches × k small rows.  No shuffle.
- ``knn_lsh``: the scale path — random-hyperplane LSH buckets both
  sides so each query only scores its bucket's vectors (probing the
  query's bucket ± multiprobe flips).  Trades recall for a ~B×
  candidate reduction; same merge shape.
- ``cosine_neardup_pairs``: all pairs with cosine >= tau (exact,
  blocked matmul per batch against the broadcast matrix) — the
  embedding near-dup operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _normalize(mat: np.ndarray) -> np.ndarray:
    mat = mat.astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _batch_mat(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    dim = len(arr[0])
    return flat.reshape(len(arr), dim)


class _TopKScorer:
    """map_batches stage: broadcast query matrix fetched once per task
    lineage (ray.get of a shared object-store ref, zero-copy numpy)."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str,
                 exclude_self: bool):
        q = ray.get(queries_ref)
        self.qids = q["ids"]
        self.qmat = q["mat"]  # already L2-normalized, float64
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        mat = _normalize(_batch_mat(batch, self.vec_col))
        sims = self.qmat @ mat.T  # [Q, n]
        if self.exclude_self:
            mask = self.qids[:, None] == ids[None, :]
            sims = np.where(mask, -np.inf, sims)
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows_q, rows_n, rows_s = [], [], []
        for qi in range(sims.shape[0]):
            for j in idx[qi]:
                if np.isfinite(sims[qi, j]):
                    rows_q.append(int(self.qids[qi]))
                    rows_n.append(int(ids[j]))
                    rows_s.append(float(sims[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(rows_q, pa.int64()),
                "neighbor_id": pa.array(rows_n, pa.int64()),
                "cos_sim": pa.array(rows_s, pa.float64()),
            }
        )


def knn_brute(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pa.Table:
    """Exact cosine top-k; returns (query_id, neighbor_id, cos_sim,
    rank) sorted, rank 1-based, ties broken by neighbor_id."""
    ref = ray.put({"ids": np.asarray(query_ids), "mat": _normalize(query_mat)})
    cands = ds.map_batches(
        _TopKScorer(ref, k, id_col, vec_col, exclude_self),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    return _merge_topk(cands, k)


def _merge_topk(cands: list[dict], k: int) -> pa.Table:
    by_q: dict[int, list[tuple[float, int]]] = {}
    for r in cands:
        by_q.setdefault(r["query_id"], []).append((r["cos_sim"], r["neighbor_id"]))
    q_out, n_out, s_out, rank_out = [], [], [], []
    for qid in sorted(by_q):
        best = sorted(by_q[qid], key=lambda t: (-t[0], t[1]))[:k]
        for rank, (sim, nid) in enumerate(best, 1):
            q_out.append(qid)
            n_out.append(nid)
            s_out.append(sim)
            rank_out.append(rank)
    return pa.table(
        {
            "query_id": pa.array(q_out, pa.int64()),
            "neighbor_id": pa.array(n_out, pa.int64()),
            "cos_sim": pa.array(s_out, pa.float64()),
            "rank": pa.array(rank_out, pa.int64()),
        }
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_bucket_ids(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes.T) > 0  # [n, P]
    weights = 1 << np.arange(planes.shape[0], dtype=np.int64)
    return bits @ weights


def knn_lsh(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    *,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> pa.Table:
    """Approximate top-k: score only vectors sharing the query's LSH
    bucket (single-probe).  Recall < 1 by design; the candidate volume
    drops ~2^n_planes-fold, which is the 10^9-vector path."""
    qmat = _normalize(query_mat)
    planes = _hyperplanes(qmat.shape[1], n_planes, seed)
    qbuckets = lsh_bucket_ids(qmat, planes)
    ref = ray.put(
        {"ids": np.asarray(query_ids), "mat": qmat, "planes": planes,
         "qbuckets": qbuckets}
    )

    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mat = _normalize(_batch_mat(batch, vec_col))
        buckets = lsh_bucket_ids(mat, q["planes"])
        rows_q, rows_n, rows_s = [], [], []
        for qi, qb in enumerate(q["qbuckets"]):
            sel = np.flatnonzero(buckets == qb)
            if not len(sel):
                continue
            sims = mat[sel] @ q["mat"][qi]
            order = np.argsort(-sims)[:k]
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

    cands = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True).take_all()
    return _merge_topk(cands, k)


def cosine_neardup_pairs(
    ds: ray.data.Dataset,
    all_ids: np.ndarray,
    all_mat: np.ndarray,
    *,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact near-dup pairs (id_a < id_b, cosine >= tau).  Reference
    side is broadcast once; each batch emits only threshold survivors."""
    ref = ray.put({"ids": np.asarray(all_ids), "mat": _normalize(all_mat)})

    def score(batch: pa.Table) -> pa.Table:
        r = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mat = _normalize(_batch_mat(batch, vec_col))
        sims = mat @ r["mat"].T  # [n, N]
        out_a, out_b, out_s = [], [], []
        ii, jj = np.nonzero(sims >= tau)
        for i, j in zip(ii, jj):
            a, b = int(ids[i]), int(r["ids"][j])
            if a < b:
                out_a.append(a)
                out_b.append(b)
                out_s.append(float(sims[i, j]))
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    rows = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True).take_all()
    rows.sort(key=lambda r: (r["id_a"], r["id_b"]))
    return pa.table(
        {
            "id_a": pa.array([r["id_a"] for r in rows], pa.int64()),
            "id_b": pa.array([r["id_b"] for r in rows], pa.int64()),
            "cos_sim": pa.array([r["cos_sim"] for r in rows], pa.float64()),
        }
    )
