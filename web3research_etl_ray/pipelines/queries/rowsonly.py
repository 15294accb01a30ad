"""Rows-only operators (no SQL-expressible oracle).

Split from the monolithic queries.py (VERDICT r04 Next #7); the
source text of every operator is unchanged — only module boundaries
and explicit imports were added.  Registered in ``queries._registry``.
"""

from ._shared import (  # noqa: F401
    Sum,
    _cents,
    _from_rows,
    _read,
    knn_lsh,
    lang_id,
    media_feature_pipeline,
    minhash_lsh_pairs,
    np,
    pa,
    pc,
    ray,
    rolling_fingerprint,
    sha256_hex,
    simhash64,
    simhash_neardup_pairs,
    token_stats,
)
from .sim import (  # noqa: F401
    _load_queries,
)

# ---------------------------------------------------------------------------
# 6. Rows-only operators (no SQL-expressible oracle)
# ---------------------------------------------------------------------------


def q_lang_id_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return ds.map_batches(
        lambda t: lang_id(t).select(["doc_id", "lang", "lang_pred"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _lang_id_oracle() -> str:
    """Exact SQL mirror of ``functions/text.py::lang_id``: the engine's
    RE2 stopword counts are reproducible in DuckDB (also RE2-backed) as
    ``len(regexp_extract_all(...))``; the argmax with first-max-wins in
    sorted language order becomes a CASE cascade.  Generated from the
    same STOPWORDS dict so the two sides cannot drift."""
    from ...functions.text import CJK_RE, STOPWORDS

    score_cols = []
    for lg, words in STOPWORDS.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        score_cols.append(
            f"len(regexp_extract_all(lower(text), '{pat}')) AS s_{lg}"
        )
    score_cols.append(f"len(regexp_extract_all(text, '{CJK_RE}')) AS s_zh")
    langs = sorted(list(STOPWORDS) + ["zh"])
    cases = []
    for i, lg in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"s_{lg} >= s_{other}" for other in langs[i + 1:]
        )
        cases.append(f"WHEN {conds} THEN '{lg}'")
    all_s = ", ".join(f"s_{lg}" for lg in langs)
    return f"""
WITH s AS (
  SELECT doc_id, lang, {", ".join(score_cols)}
  FROM documents
)
SELECT doc_id, lang,
  CASE WHEN greatest({all_s}) = 0 THEN 'und'
       {" ".join(cases)}
       ELSE '{langs[-1]}'
  END AS lang_pred
FROM s
"""


ORACLE_LANG_ID = _lang_id_oracle()


def q_curate_documents(sf_dir: str) -> pa.Table:
    """FLAGSHIP curation composition — the shape of a 100 TB
    training-data pre-processing run as ONE streaming pipeline:

        read → [pii_scan ∘ quality_score ∘ lang_id]  (one fused
        vectorized batch stage — each text is scanned while already
        in cache, no extra passes)
        → filter (PII-free, quality ≥ 0.75, language identified)
        → exact dedup over the SURVIVORS (per-batch sha partials →
          tiny groupby → broadcast keep-set)
        → curated (doc_id, lang_pred, n_tokens, quality)

    Every stage streams; see ``pipelines/curate.py`` for the scale
    notes (survivor pinning, broadcast→semi-join keep-filter)."""
    from ..curate import curate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = curate(ds, quality_min=0.75)
    return _from_rows(
        out.take_all(),
        {"doc_id": pa.int64(), "lang_pred": pa.string(),
         "n_tokens": pa.int64(), "quality": pa.float64()},
    ).sort_by("doc_id")


def _curate_oracle() -> str:
    """The full curation pipeline as one SQL statement, built from the
    same component oracles (lang CASE cascade generated from the same
    STOPWORDS dict) so the two sides cannot drift."""
    lang_sql = _lang_id_oracle().replace("FROM documents", "FROM base")
    return rf"""
WITH base AS (SELECT doc_id, text FROM documents),
lang AS ({lang_sql.replace("SELECT doc_id, lang,", "SELECT doc_id,")}),
feat AS (
  SELECT doc_id, text,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(regexp_extract_all(text, '\w+')) AS DOUBLE) AS n_tokens_d,
         len(regexp_extract_all(text, '\w+')) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS n_punct,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS n_digits,
         len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS n_emails,
         len(regexp_extract_all(text,
             '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b')) AS n_ipv4,
         len(regexp_extract_all(text, '\d{{9,}}')) AS n_long_digits
  FROM base
),
scored AS (
  SELECT f.doc_id, f.text, l.lang_pred, f.n_tokens,
         least(f.n_chars / 200.0, 1.0) * 0.4
       + least(f.n_tokens_d / 40.0, 1.0) * 0.4
       + (1.0 - least(f.n_punct / greatest(f.n_chars, 1.0) * 5.0, 1.0)) * 0.1
       + (1.0 - least(f.n_digits / greatest(f.n_chars, 1.0) * 5.0, 1.0)) * 0.1
         AS quality
  FROM feat f JOIN lang l USING (doc_id)
  WHERE f.n_emails + f.n_ipv4 + f.n_long_digits = 0
),
surv AS (
  SELECT * FROM scored WHERE quality >= 0.75 AND lang_pred <> 'und'
),
dedup AS (
  SELECT *, min(doc_id) OVER (PARTITION BY sha256(text)) AS rep_id
  FROM surv
)
SELECT doc_id, lang_pred, n_tokens, quality
FROM dedup WHERE doc_id = rep_id ORDER BY doc_id
"""


ORACLE_CURATE = _curate_oracle()


def q_split_documents(sf_dir: str) -> pa.Table:
    """Deterministic content-hash train/val/test split (80/10/10):
    the first sha256 byte of the text decides the split, so the
    assignment is reproducible across runs/machines, independent of
    row order and partitioning, and stable under corpus growth (a doc
    never migrates).  Embarrassingly parallel, zero shuffle.  The SQL
    mirror compares the first two hex chars lexicographically
    ('cc' = 204, 'e6' = 230) — identical semantics."""
    from ...functions.hashing import sha256_binary

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def assign(t: pa.Table) -> pa.Table:
        sha = sha256_binary(t.column("text"))
        if isinstance(sha, pa.ChunkedArray):
            sha = sha.combine_chunks()
        # fixed_size_binary[32]: value i's first byte sits at stride
        # i*32 in the data buffer (vectorized, no per-row slice)
        if t.num_rows:
            data = np.frombuffer(sha.buffers()[1], np.uint8)
            first = data[sha.offset * 32 :: 32][: len(sha)]
        else:
            first = np.zeros(0, np.uint8)
        split = np.where(
            first < 204, "train", np.where(first < 230, "val", "test")
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SPLIT = """
SELECT doc_id,
       CASE WHEN substr(sha256(text), 1, 2) < 'cc' THEN 'train'
            WHEN substr(sha256(text), 1, 2) < 'e6' THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


_PACK_BUDGET = 512  # tokens per packed sequence bin


def q_seq_pack_documents(sf_dir: str) -> pa.Table:
    """Sequence packing for pre-training (contiguous greedy by
    doc_id): each doc lands in bin floor(tokens_before / budget),
    where tokens_before is the GLOBAL ordered prefix sum of token
    counts — computed by the distributed range-partitioned two-pass
    scan (``functions/window.py::ordered_prefix_sum``), not a driver
    loop.  Exact SQL-window parity."""
    from ...functions.window import ordered_prefix_sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def count_tokens(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "n_tokens": token_stats(t).column("n_tokens"),
            }
        )

    counted = ds.map_batches(
        count_tokens, batch_format="pyarrow", zero_copy_batch=True
    )
    scanned = ordered_prefix_sum(counted, "doc_id", "n_tokens")

    def binify(t: pa.Table) -> pa.Table:
        run = t.column("running").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": t.column("n_tokens"),
                "bin_id": pa.array((run - n) // _PACK_BUDGET, pa.int64()),
            }
        )

    return scanned.map_batches(
        binify, batch_format="pyarrow", zero_copy_batch=True
    )


ORACLE_SEQ_PACK = rf"""
WITH t AS (
  SELECT doc_id, len(regexp_extract_all(text, '\w+')) AS n_tokens
  FROM documents
),
r AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id) AS running
  FROM t
)
SELECT doc_id, n_tokens,
       CAST((running - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS bin_id
FROM r
"""


def q_semantic_neardup_docs(sf_dir: str) -> pa.Table:
    """Model-free semantic near-dup: hash_embed the documents, then
    LSH-bucketed cosine pairs — the end-to-end composition (text →
    embedding → ANN) with no external model or embedding table.
    Rows-only (float fixpoint of two approximations); planted-near-dup
    recall is unit-tested."""
    from ...functions.similarity import cosine_neardup_lsh, hash_embed

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    embedded = ds.map_batches(
        lambda t: hash_embed(t).drop_columns(["text"]).rename_columns(
            ["vec_id", "embedding"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = cosine_neardup_lsh(embedded, tau=0.9)
    return out.select(["id_a", "id_b"])


def q_pagerank_parts(sf_dir: str) -> pa.Table:
    """PageRank over the bipartite supplier→part shipment graph from
    lineitem (iterative workload: per-iteration hash join + groupby —
    see functions/graph.py).  Rows-only check (iterative float
    fixpoint has no SQL oracle); exactness vs a dense numpy reference
    is asserted in tests."""
    from ...functions.graph import pagerank

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
    edges = li.map_batches(
        lambda t: pa.table(
            {
                "src": t.column("l_suppkey").cast(pa.int64()),
                "dst": pc.add(
                    t.column("l_partkey").cast(pa.int64()),
                    pa.scalar(1_000_000, pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = pagerank(edges, iterations=5)
    rows = out.take_all()
    rows.sort(key=lambda r: r["node"])
    return pa.table(
        {
            "node": pa.array([r["node"] for r in rows], pa.int64()),
            "rank": pa.array([round(r["rank"], 10) for r in rows],
                             pa.float64()),
        }
    )


def q_prepare_training_set(sf_dir: str) -> pa.Table:
    """THE end-to-end pre-training data prep, one streaming pipeline,
    oracle-exact at every stage: curate (fused PII/quality/lang scan →
    filter → exact dedup) → content-hash train split → contiguous
    sequence packing of the train docs via the distributed ordered
    prefix scan.  A user points this at a documents table and gets
    back the packed train manifest."""
    from ...functions.hashing import sha256_binary
    from ...functions.window import ordered_prefix_sum
    from ..curate import curate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    curated = curate(ds, quality_min=0.75, keep_text=True)

    def train_only(t: pa.Table) -> pa.Table:
        sha = sha256_binary(t.column("text"))
        if isinstance(sha, pa.ChunkedArray):
            sha = sha.combine_chunks()
        if t.num_rows:
            data = np.frombuffer(sha.buffers()[1], np.uint8)
            first = data[sha.offset * 32 :: 32][: len(sha)]
        else:
            first = np.zeros(0, np.uint8)
        t = t.filter(pa.array(first < 204)).drop_columns(["text"])
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "lang_pred": t.column("lang_pred"),
                "n_tokens": t.column("n_tokens").cast(pa.int64()),
                "quality": t.column("quality"),
            }
        )

    train = curated.map_batches(
        train_only, batch_format="pyarrow", zero_copy_batch=True
    )
    scanned = ordered_prefix_sum(train, "doc_id", "n_tokens")

    def binify(t: pa.Table) -> pa.Table:
        run = t.column("running").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        return t.drop_columns(["running"]).append_column(
            "bin_id", pa.array((run - n) // _PACK_BUDGET, pa.int64())
        )

    return scanned.map_batches(
        binify, batch_format="pyarrow", zero_copy_batch=True
    )


def _prepare_training_oracle() -> str:
    curated = ORACLE_CURATE.strip().rstrip()
    return rf"""
WITH curated AS ({curated}),
withsplit AS (
  SELECT c.*, substr(sha256(d.text), 1, 2) AS shp
  FROM curated c JOIN documents d USING (doc_id)
),
train AS (SELECT * FROM withsplit WHERE shp < 'cc')
SELECT doc_id, lang_pred, n_tokens, quality,
       CAST((sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens)
            // {_PACK_BUDGET} AS BIGINT) AS bin_id
FROM train
"""


ORACLE_PREPARE = _prepare_training_oracle()


def q_epoch_shuffle_documents(sf_dir: str) -> pa.Table:
    """Deterministic epoch shuffle for training: every doc gets a
    GLOBAL shuffle rank — row_number over (sha256('epoch1:'+doc_id)
    60-bit prefix, doc_id).  Reproducible across runs/engines with no
    seed side-channel, and a different epoch string reshuffles.
    Distributed as the range-partitioned prefix scan (hash keys are
    uniform ⇒ perfectly balanced ranges), value=1, tiebreak=doc_id —
    never a global sort."""
    from ...functions.hashing import sha256_hex
    from ...functions.window import ordered_prefix_sum

    ds = _read(sf_dir, "documents", ["doc_id"])

    def key(t: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(
            pa.array(["epoch1"] * t.num_rows),
            t.column("doc_id").cast(pa.string()),
            ":",
        )
        sha = sha256_hex(s)
        if isinstance(sha, pa.ChunkedArray):
            sha = sha.combine_chunks()
        # 60-bit prefix (15 hex chars) keeps the order key in int64;
        # vectorized hex parse straight off the string buffer
        if t.num_rows:
            offs = np.frombuffer(sha.buffers()[1], np.int32)[
                sha.offset : sha.offset + len(sha)
            ]
            data = np.frombuffer(sha.buffers()[2], np.uint8)
            k = np.zeros(len(sha), np.int64)
            for i in range(15):
                b = data[offs + i].astype(np.int64)
                k = (k << 4) | (b - 48 - 39 * (b >= 97))
        else:
            k = np.zeros(0, np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
                "k64": pa.array(k, pa.int64()),
            }
        )

    keyed = ds.map_batches(key, batch_format="pyarrow", zero_copy_batch=True)
    out = ordered_prefix_sum(
        keyed, "k64", "one", out_col="shuffle_rank", tiebreak_col="doc_id"
    )
    return out.map_batches(
        lambda t: t.select(["doc_id", "shuffle_rank"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


ORACLE_EPOCH_SHUFFLE = """
SELECT doc_id,
       row_number() OVER (
         ORDER BY substr(sha256('epoch1:' || CAST(doc_id AS VARCHAR)),
                         1, 15),
                  doc_id) AS shuffle_rank
FROM documents
"""


def q_embed_documents(sf_dir: str) -> pa.Table:
    """Feature-hashing document embeddings (64-dim, L2-normalized, no
    model/vocab — deterministic across batch splits): the bridge from
    the text table to the whole similarity family."""
    from ...functions.similarity import hash_embed

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: hash_embed(t).drop_columns(["text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_simhash_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: simhash64(t).select(["doc_id", "simhash"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_fingerprint_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "fingerprint": rolling_fingerprint(t.column("text")),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_minhash_lsh_pairs(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_lsh_pairs(ds, threshold=0.5)


def q_simhash_neardup_pairs(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_neardup_pairs(ds, max_hamming=3, num_bands=4)


def q_incremental_dedup_pairs(sf_dir: str) -> pa.Table:
    """Two-tick incremental near-dup over a deterministic split of the
    documents table (even doc_ids first, then odd): the union of the
    per-tick pair outputs equals the batch minhash_lsh_pairs result on
    the full corpus (tested in tests/test_dedup_index.py) — but each
    tick reads only the index buckets its docs touch."""
    import shutil
    import tempfile

    from ..dedup_index import MinHashIndex

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def half(parity: int):
        return ds.map_batches(
            lambda t, _p=parity: t.filter(
                pc.equal(
                    pc.bit_wise_and(t.column("doc_id").cast(pa.int64()), 1), _p
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    root = tempfile.mkdtemp(prefix="dedup_idx_")
    try:
        idx = MinHashIndex(root)
        t1 = idx.dedup_tick(half(0), threshold=0.5)
        t2 = idx.dedup_tick(half(1), threshold=0.5)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return pa.concat_tables([t1, t2]).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )


def q_incremental_curate(sf_dir: str) -> pa.Table:
    """Two-tick incremental curation over a doc_id-ordered split of
    the documents table: the union of per-tick outputs equals the
    batch ``curate_documents`` result (first-seen == min-doc_id when
    ticks arrive in id order — the CDC arrival property; equivalence
    incl. cross-tick duplicates tested in tests/test_curate_index.py).
    Each tick probes only the sha buckets it touches."""
    import shutil
    import tempfile

    from ..curate import CurateIndex

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def part(lo: int, hi: int):
        return ds.map_batches(
            lambda t, _lo=lo, _hi=hi: t.filter(
                pc.and_(
                    pc.greater_equal(t.column("doc_id"), pa.scalar(_lo)),
                    pc.less(t.column("doc_id"), pa.scalar(_hi)),
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    root = tempfile.mkdtemp(prefix="curate_idx_")
    try:
        idx = CurateIndex(root)
        t1 = idx.tick(part(0, 250))
        t2 = idx.tick(part(250, 10**9))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return pa.concat_tables([t1, t2]).sort_by("doc_id")


def q_dedup_clusters(sf_dir: str) -> pa.Table:
    """Near-dup clusters: MinHash-LSH pairs → distributed hash-to-min
    connected components → (doc_id, cluster_id)."""
    from ...functions.dedup import connected_components_ds

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_lsh_pairs(ds, threshold=0.5)
    rows = connected_components_ds(ray.data.from_arrow(pairs)).take_all()
    if not rows:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "cluster_id": pa.array([], pa.int64())}
        )
    return pa.Table.from_pylist(rows).sort_by("doc_id")


def q_knn_lsh(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ids, mat = _load_queries(sf_dir)
    return knn_lsh(ds, ids, mat, k=10).select(["query_id", "neighbor_id", "rank"])


def q_knn_pq(sf_dir: str) -> pa.Table:
    """Compressed-domain ANN: PQ codes (8 bytes/vector at 64-dim, 32x
    vs float32) + per-query ADC lookup tables + exact refine of the
    ADC shortlist.  The 100TB-of-embeddings path — the code table is
    what scans, raw vectors serve only the bounded refine fetch.
    Recall vs knn_brute measured in tests."""
    from ...functions.similarity import knn_pq

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ids, mat = _load_queries(sf_dir)
    out = knn_pq(ds, ids, mat, k=10, n_sub=8, n_cent=32, refine=4)
    return out.select(["query_id", "neighbor_id", "rank"])


def q_multimodal_features(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = media_feature_pipeline(ds)
    rows = out.take_all()
    rows.sort(key=lambda r: r["media_id"])
    return pa.table(
        {
            "media_id": pa.array([r["media_id"] for r in rows], pa.int64()),
            "payload_bytes": pa.array([r["payload_bytes"] for r in rows], pa.int64()),
            "feat0": pa.array([float(r["features"][0]) for r in rows], pa.float64()),
        }
    )


def q_multimodal_decode_bmp(sf_dir: str) -> pa.Table:
    """REAL image decode path: documents rendered as 24-bit BMP
    payloads, decoded by the pure-numpy parser in an actor-pool stage;
    width/height/features come from actual pixel data."""
    from ...functions.multimodal import media_decode_pipeline

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    rows = media_decode_pipeline(ds).take_all()
    rows.sort(key=lambda r: r["media_id"])
    return pa.table(
        {
            "media_id": pa.array([r["media_id"] for r in rows], pa.int64()),
            "width": pa.array([r["width"] for r in rows], pa.int32()),
            "height": pa.array([r["height"] for r in rows], pa.int32()),
            "feat0": pa.array([float(r["features"][0]) for r in rows], pa.float64()),
        }
    )


def q_video_frame_sample(sf_dir: str) -> pa.Table:
    """Frame-sampling path: documents rendered as deterministic
    8-frame RAWV clips, uniformly sampled to 4 frames per clip with
    per-frame features, in an actor-pool stage."""
    from ...functions.multimodal import video_frame_pipeline

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    rows = video_frame_pipeline(ds).take_all()
    rows.sort(key=lambda r: (r["media_id"], r["frame_idx"]))
    return pa.table(
        {
            "media_id": pa.array([r["media_id"] for r in rows], pa.int64()),
            "frame_idx": pa.array([r["frame_idx"] for r in rows], pa.int64()),
            "feat0": pa.array(
                [float(r["features"][0]) for r in rows], pa.float64()
            ),
        }
    )


def q_range_join_value_bins(sf_dir: str) -> pa.Table:
    """Distributed interval (range) join — one of the custom operators
    the task brief names (as-of / RANGE join / windowed aggregate).
    Events join OVERLAPPING value bins (width 15, stride 5 ⇒ each value
    matches up to 3 bins) via ``functions/joins.py::range_join``'s
    chunked exchange, then a partial+final grouped aggregate per bin.
    The bin table is generated deterministically on both sides
    (numpy here, ``range()`` in the oracle)."""
    from ...functions.joins import range_join

    ds = _read(sf_dir, "events", ["value"])
    i = np.arange(98, dtype=np.int64)
    bins = ray.data.from_arrow(
        pa.table(
            {
                "bin_id": pa.array(i),
                "lo": pa.array(i * 5.0),
                "hi": pa.array(i * 5.0 + 15.0),
            }
        )
    )
    joined = range_join(
        ds,
        bins,
        on="value",
        lo="lo",
        hi="hi",
        point_cols=["value"],
        interval_cols=["bin_id"],
        boundaries=[float(b) for b in range(25, 500, 25)],
    )

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "bin_id": t.column("bin_id").cast(pa.int64()),
                "value_cents": _cents(t.column("value")),
            }
        )
        return (
            g.group_by("bin_id")
            .aggregate([("value_cents", "sum"), ("value_cents", "count")])
            .rename_columns(["bin_id", "sum_value_cents", "n"])
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin_id")
        .aggregate(
            Sum("sum_value_cents", alias_name="sum_value_cents"),
            Sum("n", alias_name="n"),
        )
    )


ORACLE_RANGE_JOIN = """
SELECT b.bin_id,
       CAST(sum(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       count(*) AS n
FROM events e
JOIN (SELECT i AS bin_id, i * 5.0 AS lo, i * 5.0 + 15.0 AS hi
      FROM range(0, 98) t(i)) b
  ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.bin_id
"""


def q_sliding_window_activity(sf_dir: str) -> pa.Table:
    """Sliding (hopping) window aggregate: 60-minute windows advancing
    every 15 minutes — each event lands in exactly 4 windows.  The
    window fan-out is a vectorized flat_map (bucket − k·stride for
    k = 0..3) followed by a per-batch partial and one small final
    groupby; no per-row Python and no all-to-all beyond the grouped
    aggregate itself.  Complements the tumbling (`hourly_user_activity`)
    and session (`session_windows`) variants."""
    ds = _read(sf_dir, "events", ["ts", "value"])
    stride_us = 15 * 60 * 1_000_000
    n_offsets = 4

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        bucket = (ts // stride_us) * stride_us
        cents = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        starts = np.concatenate(
            [bucket - k * stride_us for k in range(n_offsets)]
        )
        g = pa.table(
            {
                "window_start_us": pa.array(starts),
                "value_cents": pa.array(np.tile(cents, n_offsets)),
            }
        )
        return (
            g.group_by("window_start_us")
            .aggregate([("value_cents", "sum"), ("value_cents", "count")])
            .rename_columns(["window_start_us", "sum_value_cents", "n"])
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("window_start_us")
        .aggregate(
            Sum("sum_value_cents", alias_name="sum_value_cents"),
            Sum("n", alias_name="n"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": t.column("window_start_us").cast(
                    pa.timestamp("us")
                ),
                "sum_value_cents": t.column("sum_value_cents"),
                "n": t.column("n"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SLIDING = """
WITH x AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts) AS b,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT b - CAST(k AS INT) * INTERVAL '15 minutes' AS window_start,
       CAST(sum(cents) AS BIGINT) AS sum_value_cents,
       count(*) AS n
FROM x, range(0, 4) t(k)
GROUP BY window_start
"""


