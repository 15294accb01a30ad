"""Similarity search over embeddings.

Split from the monolithic queries.py (VERDICT r04 Next #7); the
source text of every operator is unchanged — only module boundaries
and explicit imports were added.  Registered in ``queries._registry``.
"""

from ._shared import (  # noqa: F401
    _read,
    _tbl,
    cosine_neardup_pairs,
    knn_brute,
    np,
    pa,
    pc,
    pq,
)

# ---------------------------------------------------------------------------
# 4. Similarity search over embeddings
# ---------------------------------------------------------------------------


def _load_queries(sf_dir: str, n: int = 5):
    t = pq.read_table(_tbl(sf_dir, "embeddings"))
    t = t.filter(pc.less(t.column("vec_id"), n))
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()])
    return ids, mat


def q_knn_cosine(sf_dir: str) -> pa.Table:
    """Brute-force cosine top-10 for the first 5 vectors (broadcast
    query matrix, per-batch float64 matmul, driver-side k-merge)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ids, mat = _load_queries(sf_dir)
    out = knn_brute(ds, ids, mat, k=10)
    return out.select(["query_id", "neighbor_id", "rank"])


ORACLE_KNN = """
WITH s AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         list_cosine_similarity(a.embedding, b.embedding) AS sim
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
  WHERE a.vec_id < 5
),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 10
"""


def q_knn_ivf(sf_dir: str) -> pa.Table:
    """IVF ANN (trained coarse quantizer — the data-adaptive companion
    to knn_lsh): top-10 for the first 5 vectors probing 6/16 cells.
    Recall vs knn_brute measured in tests (0.9 at 25% cells on
    clustered data; ~probed-fraction on this near-random fixture)."""
    from ...functions.similarity import knn_ivf

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ids, mat = _load_queries(sf_dir)
    out = knn_ivf(ds, ids, mat, k=10, n_centroids=16, n_probe=6)
    return out.select(["query_id", "neighbor_id", "rank"])


def q_embedding_neardup(sf_dir: str) -> pa.Table:
    """Embedding-cosine near-dup pairs (tau=0.4 for this synthetic
    data; margin to the threshold verified >> float error).  Exact via
    the distributed block-pair exchange — no driver-side matrix."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = cosine_neardup_pairs(ds, tau=0.4)
    return out.select(["id_a", "id_b"])


def q_embedding_neardup_lsh(sf_dir: str) -> pa.Table:
    """Corpus-scale approximate variant: exact cosine only within
    hyperplane-LSH buckets; recall measured in tests.  tau=0.4 is a
    LOW-similarity regime (angle ~66°), so collision probability per
    plane is only ~0.63 — few planes, many tables keeps recall ~0.9;
    a real near-dup run (tau>=0.95) would use 8+ planes for stronger
    pruning."""
    from ...functions.similarity import cosine_neardup_lsh

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = cosine_neardup_lsh(ds, tau=0.4, n_planes=3, n_tables=8)
    return out.select(["id_a", "id_b"])


ORACLE_NEARDUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
"""


