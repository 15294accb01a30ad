"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): select raw-corpus documents whose hashed n-gram
distribution looks like a small TARGET corpus, via importance weights
on hashed token features + Gumbel top-k resampling.

Distributed shape (all three passes stream; driver state is O(B)):
1. one pass bincounts hashed token features into B buckets twice —
   all docs (source) and the target subset — per batch, emitting tiny
   (bucket, n_src, n_tgt) partials; the driver folds them into two
   B-vectors and forms the smoothed log-ratio w[b] = log p̂_tgt[b] −
   log p̂_src[b] (Laplace +1 over B buckets);
2. w (B float64, a few KiB) broadcasts via ray.put; a second pass
   scores every doc: logweight = Σ_tokens w[bucket(token)] — one
   np.add.at per batch over the engine's vectorized token-hash stream;
3. Gumbel top-k: g = logweight + Gumbel(u), u the doc_id-sha256
   60-bit prefix scaled to (0,1] — the same reproducible no-RNG
   uniform the priority sampler uses — selected by per-batch partial
   top-k, so the all-to-all sees batches × k rows, never the corpus.

Everything is deterministic (no seed side-channel) and invariant to
batch/partition splits: counts are additive, scores are per-doc sums
in float64 over a fixed bucket order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .text import token_hash_stream


def _sha_uniform(ids: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Reproducible uniform in (0, 1] from the sha256 hex prefix of the
    id — identical scheme to the priority sampler / epoch shuffle."""
    import pyarrow.compute as pc

    from .hashing import sha256_hex

    sha = sha256_hex(pc.cast(ids, pa.string()))
    if isinstance(sha, pa.ChunkedArray):
        sha = sha.combine_chunks()
    n = len(sha)
    if not n:
        return np.zeros(0, np.float64)
    offs = np.frombuffer(sha.buffers()[1], np.int32)[
        sha.offset : sha.offset + n
    ]
    data = np.frombuffer(sha.buffers()[2], np.uint8)
    u = np.zeros(n, np.int64)
    for i in range(15):
        b = data[offs + i].astype(np.int64)
        u = (u << 4) | (b - 48 - 39 * (b >= 97))
    return (u.astype(np.float64) + 1.0) / float(1 << 60)


def hashed_feature_counts(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    target_col: str,
    buckets: int = 8192,
) -> tuple[np.ndarray, np.ndarray]:
    """(source_counts[B], target_counts[B]) of hashed token features —
    source = every doc, target = rows where ``target_col`` is true."""

    def partial(t: pa.Table) -> pa.Table:
        h, p = token_hash_stream(t.column(text_col))
        b = (h % np.uint64(buckets)).astype(np.int64)
        src = np.bincount(b, minlength=buckets).astype(np.int64)
        tmask = (
            t.column(target_col)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        tgt = np.bincount(
            b[tmask[p]], minlength=buckets
        ).astype(np.int64)
        nz = np.flatnonzero(src)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "n_src": pa.array(src[nz], pa.int64()),
                "n_tgt": pa.array(tgt[nz], pa.int64()),
            }
        )

    src = np.zeros(buckets, np.int64)
    tgt = np.zeros(buckets, np.int64)
    for row in ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all():
        src[row["bucket"]] += row["n_src"]
        tgt[row["bucket"]] += row["n_tgt"]
    return src, tgt


def dsir_logratio(src: np.ndarray, tgt: np.ndarray) -> np.ndarray:
    """Smoothed per-bucket log importance ratio (Laplace +1)."""
    B = len(src)
    p_t = (tgt + 1.0) / (tgt.sum() + B)
    p_s = (src + 1.0) / (src.sum() + B)
    return np.log(p_t) - np.log(p_s)


def dsir_scores(
    ds: ray.data.Dataset,
    w: np.ndarray,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "logweight",
) -> ray.data.Dataset:
    """Per-doc importance logweight = Σ w[bucket(token)] — w broadcast
    once via ray.put, one scatter-add per batch."""
    buckets = len(w)
    w_ref = ray.put(w)

    def score(t: pa.Table) -> pa.Table:
        wv = ray.get(w_ref)
        h, p = token_hash_stream(t.column(text_col))
        lw = np.zeros(t.num_rows, np.float64)
        if len(h):
            b = (h % np.uint64(buckets)).astype(np.int64)
            np.add.at(lw, p, wv[b])
        return pa.table(
            {
                id_col: t.column(id_col),
                out_col: pa.array(lw, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def dsir_resample(
    scored: ray.data.Dataset,
    k: int,
    *,
    id_col: str = "doc_id",
    weight_col: str = "logweight",
) -> pa.Table:
    """Gumbel top-k over the importance logweights — equivalent to
    sampling k docs without replacement with probability ∝ exp(logw)
    (Gumbel-max trick), reproducible via the sha-prefix uniform.
    Per-batch partial top-k keeps the exchange at batches × k rows."""

    def partial(t: pa.Table) -> pa.Table:
        u = _sha_uniform(t.column(id_col).combine_chunks())
        lw = t.column(weight_col).to_numpy(zero_copy_only=False)
        g = lw - np.log(-np.log(u))
        t = t.append_column("gumbel", pa.array(g, pa.float64()))
        return t.sort_by(
            [("gumbel", "descending"), (id_col, "ascending")]
        ).slice(0, k)

    top = (
        scored.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .sort([("gumbel"), (id_col)], descending=[True, False])
        .limit(k)
        .take_all()
    )
    if not top:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                weight_col: pa.array([], pa.float64()),
                "gumbel": pa.array([], pa.float64()),
            }
        )
    return pa.Table.from_pylist(top).select([id_col, weight_col, "gumbel"])


def dsir_select(
    ds: ray.data.Dataset,
    *,
    target_col: str,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 8192,
) -> pa.Table:
    """End-to-end DSIR: fit the hashed importance ratio on ``ds``
    (target rows flagged by ``target_col``), score every doc, Gumbel
    top-k resample.  Returns (id, logweight, gumbel) of the selected
    docs."""
    src, tgt = hashed_feature_counts(
        ds, text_col=text_col, target_col=target_col, buckets=buckets
    )
    w = dsir_logratio(src, tgt)
    scored = dsir_scores(ds, w, text_col=text_col, id_col=id_col)
    return dsir_resample(scored, k, id_col=id_col)
