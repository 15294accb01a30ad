"""Hash / dedup / text-analysis operators over documents.

Split from the monolithic queries.py (VERDICT r04 Next #7); the
source text of every operator is unchanged — only module boundaries
and explicit imports were added.  Registered in ``queries._registry``.
"""

from ._shared import (  # noqa: F401
    _filter_to_reps,
    _from_rows,
    _read,
    exact_dedup_groups,
    key_hash64,
    np,
    pa,
    pc,
    quality_score,
    ray,
    sha256_hex,
    token_stats,
)

# ---------------------------------------------------------------------------
# 3. Hash / dedup / text-analysis operators over documents
# ---------------------------------------------------------------------------


def q_sha256_documents(sf_dir: str) -> pa.Table:
    """Scalar hash kernel (stored-hash invariant, BASELINE.json)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "text_sha256": sha256_hex(t.column("text")),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


ORACLE_SHA = "SELECT doc_id, sha256(text) AS text_sha256 FROM documents"


def q_exact_dedup_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup_groups(ds)


ORACLE_DEDUP = """
SELECT sha256(text) AS text_sha256, min(doc_id) AS rep_id, count(*) AS n_copies
FROM documents GROUP BY text
"""


def q_exact_dedup_keep(sf_dir: str) -> pa.Table:
    """Exact-dedup KEEP-LIST: the corpus with every non-representative
    exact duplicate dropped (representative = min doc_id per text).
    Distributed: rep-id set broadcast when small, distributed semi
    join past ``_KEEP_BROADCAST_MAX`` (see ``_filter_to_reps``)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # reps is the SMALL fold output, consumed twice (count + filter)
    reps = exact_dedup_groups(ds).materialize()
    out = _filter_to_reps(ds, reps).select_columns(["doc_id"])
    return _from_rows(out.take_all(), {"doc_id": pa.int64()}).sort_by(
        "doc_id"
    )


ORACLE_DEDUP_KEEP = """
SELECT doc_id FROM (
  SELECT doc_id, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1 ORDER BY doc_id
"""


def q_token_stats_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: token_stats(t).select(
            ["doc_id", "n_chars_calc", "n_tokens", "n_punct", "n_digits"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


ORACLE_TOKENS = r"""
SELECT doc_id,
       length(text) AS n_chars_calc,
       len(regexp_extract_all(text, '\w+')) AS n_tokens,
       len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
       len(regexp_extract_all(text, '[0-9]')) AS n_digits
FROM documents
"""


def q_top_tokens_documents(sf_dir: str) -> pa.Table:
    """Corpus wordcount, top-50 tokens: per-batch Arrow tokenize +
    hash group-by (the shuffle moves one row per distinct token per
    batch, never token instances), keyed-exchange fold over the token
    string, per-bucket top-k partial, tiny final merge.  Deterministic
    tie-break (count desc, token asc)."""
    from ...functions.window import keyed_window, segment_starts

    K = 50
    ds = _read(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")), pattern=r"\W+"
        )
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        return (
            pa.table({"token": flat})
            .group_by("token")
            .aggregate([("token", "count")])
            .rename_columns(["token", "n"])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        # numeric bucket key for the keyed exchange
        lambda t: t.append_column(
            "tok_h",
            pa.array(
                (key_hash64(t.column("token")) % np.uint64(1 << 62)).astype(
                    np.int64
                ),
                pa.int64(),
            ),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def fold_topk(g: pa.Table) -> pa.Table:
        combined = (
            g.select(["token", "n"])
            .group_by("token")
            .aggregate([("n", "sum")])
            .rename_columns(["token", "n"])
        )
        return combined.sort_by(
            [("n", "descending"), ("token", "ascending")]
        ).slice(0, K)

    top = keyed_window(partials, "tok_h", fold_topk)
    t = _from_rows(top.take_all(), {"token": pa.string(), "n": pa.int64()})
    return t.sort_by(
        [("n", "descending"), ("token", "ascending")]
    ).slice(0, K)


ORACLE_TOP_TOKENS = r"""
SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT unnest(regexp_split_to_array(lower(text), '\W+')) AS token
  FROM documents
) WHERE token <> ''
GROUP BY token ORDER BY n DESC, token LIMIT 50
"""


def q_pii_scan_documents(sf_dir: str) -> pa.Table:
    """PII pre-pass: per-document email/URL/IPv4/long-digit-run counts
    (see functions/text.py::pii_scan) — identical RE2 patterns run on
    both sides."""
    from ...functions.text import pii_scan

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: pii_scan(t).select(
            ["doc_id", "n_emails", "n_urls", "n_ipv4", "n_long_digits"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


ORACLE_PII = r"""
SELECT doc_id,
       len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
       len(regexp_extract_all(text, 'https?://[^\s]+')) AS n_urls,
       len(regexp_extract_all(text,
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
       len(regexp_extract_all(text, '\d{9,}')) AS n_long_digits
FROM documents
"""


def q_doc_quality(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: quality_score(t).select(["doc_id", "quality"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


ORACLE_QUALITY = r"""
WITH c AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(regexp_extract_all(text, '\w+')) AS DOUBLE) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS n_punct,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS n_digits
  FROM documents
)
SELECT doc_id,
       least(n_chars / 200.0, 1.0) * 0.4
     + least(n_tokens / 40.0, 1.0) * 0.4
     + (1.0 - least(n_punct / greatest(n_chars, 1.0) * 5.0, 1.0)) * 0.1
     + (1.0 - least(n_digits / greatest(n_chars, 1.0) * 5.0, 1.0)) * 0.1 AS quality
FROM c
"""


#: shingles shared by more docs than this are dropped from pair
#: generation (stop-phrase df cap, standard in dedup literature —
#: VERDICT r01 Wrong #8: one stop shingle with df 10^5 is 5·10^9
#: pairs).  Mirrored in the SQL oracle; a no-op on the fixtures
#: (max df is 25 at sf0.1) so parity is exact.
_NGRAM_DF_CAP = 1000


def _doc_shingles(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(shingle_hash int64, doc_id int64) of per-doc DISTINCT word-
    3-shingles, fully vectorized (token-hash stream + k-gram combine
    + per-doc unique).  64-bit hashed shingles stand in for the
    strings: collision probability ~ (#shingles)²/2^64 ≈ 0."""
    from ...functions.text import token_hash_stream

    h, parents = token_hash_stream(t.column("text"))
    k = 3
    if len(h) < k:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    K = np.uint64(1099511628211)
    m = len(h) - k + 1
    sh = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        sh = sh * K + h[j : m + j]
    valid = parents[:m] == parents[k - 1 :]
    sh = sh[valid]
    shp = parents[:m][valid]
    order = np.lexsort((sh, shp))
    sh, shp = sh[order], shp[order]
    keep = np.concatenate(
        ([True], (sh[1:] != sh[:-1]) | (shp[1:] != shp[:-1]))
    ) if len(sh) else np.zeros(0, bool)
    sh, shp = sh[keep], shp[keep]
    docs = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    return (sh >> np.uint64(1)).astype(np.int64), docs[shp]


def _shingle_pair_rows(ds, NB: int, PB: int):
    """Shared first two stages of the exact set-overlap family
    (`ngram_jaccard_pairs`, `ngram_containment_pairs`): hashed-shingle
    explode (each row carrying its doc's distinct-shingle count —
    sizes are batch-local, so they travel WITH the data instead of
    through a join) → per-bucket run pairs with a df cap.  Returns the
    pair-bucket-keyed Dataset (id_a, id_b, na, nb, __pb); callers
    regroup by __pb and apply their own overlap criterion."""

    def shingle_rows(t: pa.Table) -> pa.Table:
        sh, ids = _doc_shingles(t)
        if not len(ids):
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "s": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64()),
                 "__b": pa.array([], pa.int64())}
            )
        # per-doc distinct-shingle count, batch-local (docs never span
        # batches): rides every shingle row as `n`
        uniq, counts = np.unique(ids, return_counts=True)
        n_of = counts[np.searchsorted(uniq, ids)]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "s": pa.array(sh, pa.int64()),
                "n": pa.array(n_of, pa.int64()),
                "__b": pa.array(sh % NB, pa.int64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "na": pa.array([], pa.int64()), "nb": pa.array([], pa.int64()),
             "__pb": pa.array([], pa.int64())}
        )
        if group.num_rows < 2:
            return empty
        sh = group.column("s").to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        szs = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sh))
        sh, ids, szs = sh[order], ids[order], szs[order]
        starts = np.flatnonzero(np.concatenate(([True], sh[1:] != sh[:-1])))
        lens = np.diff(np.concatenate((starts, [len(sh)])))
        out_a, out_b, out_na, out_nb = [], [], [], []
        for s, ln in zip(starts, lens):
            if ln < 2 or ln > _NGRAM_DF_CAP:
                continue  # singleton or stop-phrase shingle
            run = ids[s : s + ln]  # distinct + ascending by construction
            rsz = szs[s : s + ln]
            iu, ju = np.triu_indices(len(run), k=1)
            out_a.append(run[iu])
            out_b.append(run[ju])
            out_na.append(rsz[iu])
            out_nb.append(rsz[ju])
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        return pa.table(
            {
                "id_a": pa.array(a, pa.int64()),
                "id_b": pa.array(b, pa.int64()),
                "na": pa.array(np.concatenate(out_na), pa.int64()),
                "nb": pa.array(np.concatenate(out_nb), pa.int64()),
                "__pb": pa.array((a * np.int64(2654435761) + b) % PB, pa.int64()),
            }
        )

    return (
        ds.map_batches(shingle_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )


def _pair_overlap_counts(group: pa.Table):
    """Vectorized run count over one pair bucket: one row per distinct
    (id_a, id_b) with n_inter and the size columns; None for an empty
    bucket."""
    if group.num_rows == 0:
        return None
    a = group.column("id_a").to_numpy(zero_copy_only=False)
    b = group.column("id_b").to_numpy(zero_copy_only=False)
    na = group.column("na").to_numpy(zero_copy_only=False)
    nb = group.column("nb").to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    a, b, na, nb = a[order], b[order], na[order], nb[order]
    starts = np.flatnonzero(
        np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
    )
    ni = np.diff(np.concatenate((starts, [len(a)])))
    return a[starts], b[starts], na[starts], nb[starts], ni


def _exact_jaccard_pairs_ds(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Exact word-3-shingle Jaccard >= 0.5 pairs as a streaming Dataset
    — the two-shuffle exchange shared by `ngram_jaccard_pairs` (which
    materializes the pair table) and `jaccard_clusters` /
    `triangle_count_pairs` (which keep composing distributed stages on
    top of it, so the pairs must stay out of the driver)."""

    def count_and_filter(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "n_inter": pa.array([], pa.int64()), "n_union": pa.array([], pa.int64())}
        )
        counts = _pair_overlap_counts(group)
        if counts is None:
            return empty
        a, b, na, nb, ni = counts
        nu = na + nb - ni
        keep = 2 * ni >= nu
        if not keep.any():
            return empty
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                "n_inter": pa.array(ni[keep], pa.int64()),
                "n_union": pa.array(nu[keep], pa.int64()),
            }
        )

    return (
        _shingle_pair_rows(ds, 64, 32)
        .groupby("__pb")
        .map_groups(count_and_filter, batch_format="pyarrow")
    )


def q_ngram_jaccard_pairs(sf_dir: str) -> pa.Table:
    """Exact word-3-shingle Jaccard >= 0.5 pairs, fully distributed in
    TWO shuffles (`_shingle_pair_rows`) + a pair-bucket regroup where a
    vectorized run count yields n_inter and the sizes riding the pair
    rows yield n_union.  No driver-side size dict, no composite-key
    aggregate (measured 8x slower than the bucketed vectorized count).
    Integer counts only → exact SQL parity."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    rows = _exact_jaccard_pairs_ds(ds).take_all()
    return pa.Table.from_pylist(rows).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    ) if rows else pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
         "n_inter": pa.array([], pa.int64()), "n_union": pa.array([], pa.int64())}
    )


ORACLE_NGRAM = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
-- stop-phrase df cap, mirrored from the engine (_NGRAM_DF_CAP):
-- shingles shared by more than 1000 docs are excluded from pair
-- generation (no-op on the fixtures; union sizes keep all shingles)
live AS (
  SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000
),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM live)
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_inter, sa.n + sb.n - n_inter AS n_union
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE 2 * n_inter >= sa.n + sb.n - n_inter
"""


def q_ngram_containment_pairs(sf_dir: str) -> pa.Table:
    """Exact word-3-shingle CONTAINMENT >= 0.9 pairs (Broder's
    asymmetric resemblance): n_inter / min(|A|, |B|) — the dedup
    criterion that catches a short document embedded inside a long one
    (quote pages, chunked mirrors), which symmetric Jaccard misses
    because the union is dominated by the long side.  Same two-shuffle
    exchange as `ngram_jaccard_pairs` (`_shingle_pair_rows`); only the
    per-pair-bucket criterion differs, in integer math (10*ni >=
    9*min).  Integer outputs → exact SQL parity."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def count_and_filter(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "n_inter": pa.array([], pa.int64()), "n_small": pa.array([], pa.int64())}
        )
        counts = _pair_overlap_counts(group)
        if counts is None:
            return empty
        a, b, na, nb, ni = counts
        n_small = np.minimum(na, nb)
        keep = 10 * ni >= 9 * n_small
        if not keep.any():
            return empty
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                "n_inter": pa.array(ni[keep], pa.int64()),
                "n_small": pa.array(n_small[keep], pa.int64()),
            }
        )

    rows = (
        _shingle_pair_rows(ds, 64, 32)
        .groupby("__pb")
        .map_groups(count_and_filter, batch_format="pyarrow")
        .take_all()
    )
    return pa.Table.from_pylist(rows).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    ) if rows else pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
         "n_inter": pa.array([], pa.int64()), "n_small": pa.array([], pa.int64())}
    )


ORACLE_NGRAM_CONTAIN = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
live AS (
  SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000
),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM live)
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_inter, least(sa.n, sb.n) AS n_small
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE 10 * n_inter >= 9 * least(sa.n, sb.n)
"""


