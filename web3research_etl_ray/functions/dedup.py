"""Deduplication operators for training-data pipelines, Ray-Data-first.

Five families, each expressed as composable Dataset stages:

- **exact**: content-hash + hash-partitioned group-first (the engine's
  keyed dedup, same shape as the CDC LWW fold).
- **MinHash + LSH**: shingle → minhash signature per batch → explode
  to (band_id, band_hash, doc_id) rows → groupby(band) → candidate
  pairs → signature-similarity verify.  The shuffle moves only
  signatures/band keys, never document text.
- **SimHash**: 64-bit fingerprints, near-dup = small Hamming distance
  within LSH-style chunk buckets.
- **n-gram Jaccard**: exact word-shingle Jaccard for candidate pairs
  (the verify stage; also standalone at small scale with a SQL oracle).
- **embedding cosine**: near-dup pairs over an embedding column (see
  functions/similarity.py for the kNN machinery).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .hashing import sha256_hex
from .text import word_shingles

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_text_sha(batch: pa.Table, text_col: str = "text") -> pa.Table:
    return batch.append_column("text_sha256", sha256_hex(batch.column(text_col)))


def exact_dedup_groups(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """One row per distinct text: representative = min id, plus copy
    count.  hash → per-batch partial (min id / count per sha) → small
    groupby — the pre-aggregation pattern: the shuffle moves one row
    per (sha, batch), not one per document."""

    def partial(t: pa.Table) -> pa.Table:
        t = add_text_sha(t, text_col)
        return (
            t.select(["text_sha256", id_col])
            .group_by("text_sha256")
            .aggregate([(id_col, "min"), (id_col, "count")])
            .rename_columns(["text_sha256", "rep_id", "n_copies"])
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_sha256")
        .aggregate(
            ray.data.aggregate.Min("rep_id", alias_name="rep_id"),
            ray.data.aggregate.Sum("n_copies", alias_name="n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

#: Mersenne prime 2^31-1: keeps a*h+b inside uint64 so the whole
#: permutation bank evaluates as ONE vectorized numpy expression
_MERSENNE = (1 << 31) - 1


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """Actor-pool stage: permutation params built once per actor
    (__init__), signatures per batch (__call__)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 42):
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.a, self.b = _minhash_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        sh = word_shingles(text, self.shingle_k)
        if not sh:
            return np.zeros(self.num_perm, dtype=np.uint64)
        hv = np.array(
            [
                int.from_bytes(hashlib.blake2b(s.encode(), digest_size=4).digest(), "big")
                % _MERSENNE
                for s in sh
            ],
            dtype=np.uint64,
        )
        # sig_i = min((a_i * h + b_i) mod p): [P,1]*[1,S] stays < 2^62
        prods = (self.a[:, None] * hv[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return prods.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t or "") for t in batch.column("text").to_pylist()]
        return batch.append_column(
            "minhash", pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64()))
        )


def explode_bands(batch: pa.Table, num_bands: int = 16) -> pa.Table:
    """(doc_id, band_id, band_hash) rows — the LSH bucketing key.  Only
    these small rows enter the groupby shuffle."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    sigs = batch.column("minhash").to_pylist()
    out_id, out_band, out_hash = [], [], []
    for did, sig in zip(ids, sigs):
        sig = np.asarray(sig, dtype=np.uint64)
        rows_per_band = len(sig) // num_bands
        for b in range(num_bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
            out_id.append(int(did))
            out_band.append(b)
            out_hash.append(int.from_bytes(h, "big") >> 1)
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.int64()),
        }
    )


def candidate_pairs_from_band(group: pa.Table) -> pa.Table:
    """All id pairs sharing one (band_id, band_hash) bucket."""
    ids = sorted(set(group.column("doc_id").to_pylist()))
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})


def minhash_lsh_pairs(
    docs: ray.data.Dataset,
    *,
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    concurrency: int | None = None,
) -> pa.Table:
    """Near-duplicate candidate pairs with signature-estimated Jaccard
    >= threshold.  Returns a small driver-side table (id_a, id_b,
    est_jaccard), deduplicated across bands.

    Scale shape: signatures stay with their batch; the all-to-all
    moves only (band_hash, doc_id) rows; verify joins signatures back
    by broadcasting the (small) candidate id set."""
    if concurrency is None:
        # never reserve every CPU for the pool — it starves upstream
        # stages and stalls the pipeline (hard-learned rule)
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 4))
        concurrency = max(1, min(8, cpus // 2))
    sigged = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        batch_format="pyarrow",
        concurrency=concurrency,
    ).materialize()
    pairs = (
        sigged.map_batches(
            lambda t: explode_bands(t, num_bands),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["band_id", "band_hash"])
        .map_groups(candidate_pairs_from_band, batch_format="pyarrow")
        .take_all()
    )
    cand = sorted({(r["id_a"], r["id_b"]) for r in pairs})
    if not cand:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "est_jaccard": pa.array([], pa.float64())}
        )
    # verify: estimated jaccard = fraction of equal signature components
    need = {i for p in cand for i in p}
    sig_rows = sigged.map_batches(
        lambda t: t.select(["doc_id", "minhash"]).filter(
            pc.is_in(t.column("doc_id"), value_set=pa.array(sorted(need)))
        ),
        batch_format="pyarrow",
    ).take_all()
    sigs = {r["doc_id"]: np.asarray(r["minhash"], dtype=np.uint64) for r in sig_rows}
    ids_a, ids_b, est = [], [], []
    for a, b in cand:
        j = float((sigs[a] == sigs[b]).mean())
        if j >= threshold:
            ids_a.append(a)
            ids_b.append(b)
            est.append(j)
    return pa.table(
        {
            "id_a": pa.array(ids_a, pa.int64()),
            "id_b": pa.array(ids_b, pa.int64()),
            "est_jaccard": pa.array(est, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verify kernel + standalone small-scale op)
# ---------------------------------------------------------------------------


def ngram_jaccard_matrix(texts: dict[int, str], k: int = 3) -> list[tuple[int, int, float]]:
    """Exact word-k-shingle Jaccard for every id pair (small inputs)."""
    sh = {i: word_shingles(t, k) for i, t in texts.items()}
    ids = sorted(sh)
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sh[ids[i]], sh[ids[j]]
            u = len(a | b)
            out.append((ids[i], ids[j], (len(a & b) / u) if u else 0.0))
    return out
