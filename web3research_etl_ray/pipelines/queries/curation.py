"""Corpus curation: search, mixing, contamination, packing.

Split from the monolithic queries.py (VERDICT r04 Next #7); the
source text of every operator is unchanged — only module boundaries
and explicit imports were added.  Registered in ``queries._registry``.
"""

from ._shared import (  # noqa: F401
    _from_rows,
    _read,
    hashlib,
    key_hash64,
    np,
    os,
    pa,
    pc,
    sha256_hex,
)
from .rowsonly import (  # noqa: F401
    _PACK_BUDGET,
)

# ---------------------------------------------------------------------------
# r03 wave: corpus curation search/mixing/contamination operators
# ---------------------------------------------------------------------------


def q_boilerplate_prefixes(sf_dir: str) -> pa.Table:
    """Boilerplate/template detection: 8-token document PREFIXES shared
    by >= 2 docs (headers, license banners, scraped-page chrome — the
    classic C4/RefinedWeb cleanup signal, keyed on the prefix because
    templates anchor at the document start).  Distributed shape: one
    vectorized pass computes each doc's prefix (list_slice +
    binary_join — no row loop), per-batch partial counts collapse
    duplicates before the exchange, then a keyed hash-bucket exchange
    folds counts per prefix (one vectorized group count per bucket —
    never O(distinct prefixes) Ray groups)."""
    MIN_DOCS = 2
    NB = 64
    W = 8
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")), pattern=r"\W+"
        )
        prefix = pc.binary_join(pc.list_slice(toks, 0, W), " ")
        tbl = pa.table({"prefix": prefix})
        tbl = tbl.filter(pc.greater(pc.utf8_length(tbl.column("prefix")), 0))
        counts = (
            tbl.group_by("prefix").aggregate([("prefix", "count")])
            .rename_columns(["prefix", "n_docs"])
        )
        h = (key_hash64(counts.column("prefix")) % np.uint64(NB)).astype(
            np.int64
        )
        return counts.append_column("__b", pa.array(h, pa.int64()))

    def bucket(g: pa.Table) -> pa.Table:
        counts = (
            g.group_by("prefix").aggregate([("n_docs", "sum")])
            .rename_columns(["prefix", "n_docs"])
        )
        return counts.filter(
            pc.greater_equal(counts.column("n_docs"), MIN_DOCS)
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(bucket, batch_format="pyarrow")
        .take_all()
    )
    t = _from_rows(rows, {"prefix": pa.string(), "n_docs": pa.int64()})
    return t.sort_by([("n_docs", "descending"), ("prefix", "ascending")])


ORACLE_BOILERPLATE = r"""
SELECT prefix, count(*) AS n_docs
FROM (SELECT array_to_string(
        (regexp_extract_all(lower(text), '\w+'))[1:8], ' ') AS prefix
      FROM documents)
WHERE length(prefix) > 0
GROUP BY prefix HAVING count(*) >= 2
ORDER BY n_docs DESC, prefix
"""


def q_chunk_documents(sf_dir: str) -> pa.Table:
    """Sliding-window document chunking (embedding/RAG prep): 200-char
    windows, stride 160 (40 overlap).  Vectorized: chunk index k is a
    SCALAR per pass, so every doc's k-th chunk slices in one Arrow
    utf8_slice_codeunits call — no per-row Python; the pass count is
    bounded by the longest doc, not the corpus."""
    SIZE, STRIDE = 200, 160
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t.column("text"), "")
        n = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        # chunk count per doc: 1 + max(0, ceil((len - SIZE) / STRIDE))
        extra = np.ceil(np.maximum(0, n - SIZE) / STRIDE).astype(np.int64)
        n_chunks = 1 + extra
        out = []
        for k in range(int(n_chunks.max()) if len(n_chunks) else 0):
            alive = n_chunks > k
            sub = t.filter(pa.array(alive))
            piece = pc.utf8_slice_codeunits(
                pc.fill_null(sub.column("text"), ""),
                start=k * STRIDE,
                stop=k * STRIDE + SIZE,
            )
            out.append(
                pa.table(
                    {
                        "doc_id": sub.column("doc_id"),
                        "chunk_idx": pa.array(
                            np.full(sub.num_rows, k, dtype=np.int64)
                        ),
                        "chunk": piece,
                        "chunk_len": pc.utf8_length(piece).cast(pa.int64()),
                    }
                )
            )
        if not out:
            return pa.schema(
                [("doc_id", pa.int64()), ("chunk_idx", pa.int64()),
                 ("chunk", pa.string()), ("chunk_len", pa.int64())]
            ).empty_table()
        return pa.concat_tables(out)

    return ds.map_batches(chunks, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_CHUNKS = """
SELECT doc_id, i AS chunk_idx,
       substr(text, 1 + i * 160, 200) AS chunk,
       length(substr(text, 1 + i * 160, 200)) AS chunk_len
FROM documents JOIN range(0, 64) t(i)
  ON t.i <= CAST(ceil(greatest(0, length(text) - 200) / 160.0) AS BIGINT)
"""


def q_edit_distance_pairs(sf_dir: str) -> pa.Table:
    """Exact edit-distance VERIFY over template-candidate pairs: docs
    sharing an 8-token prefix (the boilerplate signal) are compared by
    Levenshtein distance of their 200-char heads; pairs within
    MAXD=40 edits survive.  The near-dup pattern LSH schemes cannot
    give exactly — an edit-metric guarantee on the emitted pairs.

    Distributed shape: candidates never leave their prefix group, so
    ONE keyed hash-bucket exchange on the prefix co-locates each
    group; inside a bucket, pair generation is vectorized per group
    SIZE (<= CAP distinct sizes, `np.triu_indices` broadcast over all
    groups of that size) and the DP itself is `levenshtein_pairs` —
    batched across pairs, one `np.minimum.accumulate` per DP row
    (functions/text.py).  Group sizes are capped at CAP=64 (mirrored
    in the oracle's HAVING, like the n-gram df cap) so a degenerate
    template cannot go quadratic."""
    W, NB, CAP, MAXD, HEAD = 8, 64, 64, 40, 200
    from ...functions.text import codepoint_matrix, levenshtein_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tag(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")), pattern=r"\W+"
        )
        prefix = pc.binary_join(pc.list_slice(toks, 0, W), " ")
        head = pc.utf8_slice_codeunits(
            pc.fill_null(t.column("text"), ""), start=0, stop=HEAD
        )
        out = pa.table(
            {"doc_id": t.column("doc_id"), "prefix": prefix, "head": head}
        )
        out = out.filter(pc.greater(pc.utf8_length(out.column("prefix")), 0))
        h = (key_hash64(out.column("prefix")) % np.uint64(NB)).astype(np.int64)
        return out.append_column("__b", pa.array(h, pa.int64()))

    def bucket(g: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()),
             ("edit_dist", pa.int64())]
        ).empty_table()
        if g.num_rows < 2:
            return empty
        g = g.sort_by([("prefix", "ascending"), ("doc_id", "ascending")])
        prefix = g.column("prefix")
        same = pc.equal(
            prefix.slice(1), prefix.slice(0, len(prefix) - 1)
        ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate(([True], ~same)))
        sizes = np.diff(np.append(starts, g.num_rows))
        keep = (sizes >= 2) & (sizes <= CAP)
        if not keep.any():
            return empty
        codes, lens = codepoint_matrix(g.column("head"), HEAD)
        ia_all, ib_all = [], []
        # vectorize pair generation per group SIZE: <= CAP distinct
        # sizes, each expands every group of that size in one broadcast
        for s in np.unique(sizes[keep]):
            gs = starts[keep & (sizes == s)]          # [G] group starts
            li, lj = np.triu_indices(int(s), k=1)     # local pair index
            ia_all.append((gs[:, None] + li[None, :]).ravel())
            ib_all.append((gs[:, None] + lj[None, :]).ravel())
        ia = np.concatenate(ia_all)
        ib = np.concatenate(ib_all)
        dist = levenshtein_pairs(codes, lens, ia, ib)
        ok = dist <= MAXD
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id_a": pa.array(did[ia[ok]], pa.int64()),
                "id_b": pa.array(did[ib[ok]], pa.int64()),
                "edit_dist": pa.array(dist[ok], pa.int64()),
            }
        )

    rows = (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(bucket, batch_format="pyarrow")
        .take_all()
    )
    t = _from_rows(
        rows,
        {"id_a": pa.int64(), "id_b": pa.int64(), "edit_dist": pa.int64()},
    )
    return t.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


ORACLE_EDIT_DISTANCE = r"""
WITH p AS (
  SELECT doc_id,
         substr(text, 1, 200) AS head,
         array_to_string(
           (regexp_extract_all(lower(text), '\w+'))[1:8], ' ') AS prefix
  FROM documents
),
p2 AS (SELECT * FROM p WHERE length(prefix) > 0),
g AS (SELECT prefix FROM p2
      GROUP BY prefix HAVING count(*) BETWEEN 2 AND 64)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist
FROM p2 a
JOIN p2 b ON a.prefix = b.prefix AND a.doc_id < b.doc_id
JOIN g ON g.prefix = a.prefix
WHERE levenshtein(a.head, b.head) <= 40
ORDER BY id_a, id_b
"""


def q_mix_char_budget(sf_dir: str) -> pa.Table:
    """Data mixing: per-source char budget — each source contributes
    docs in deterministic content-hash order until its cumulative
    n_chars exceeds the budget (the sampling primitive behind mixture
    weights like 'cap source X at N tokens').  Distributed: one keyed
    hash exchange on source, then ONE vectorized segment pass per
    bucket (sort by rank, segment cumsum) — the same shape as
    window_running_totals; no driver-side loop, no global sort."""
    BUDGET = 120_000
    from ...functions.window import keyed_window

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def tag(t: pa.Table) -> pa.Table:
        t = t.append_column(
            "rank_hash", sha256_hex(t.column("doc_id").cast(pa.string()))
        )
        # numeric key for the bucket exchange (source is a string)
        return t.append_column(
            "src_h",
            pa.array(
                (key_hash64(t.column("source")) % np.uint64(1 << 62)).astype(
                    np.int64
                ),
                pa.int64(),
            ),
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(
            [("source", "ascending"), ("rank_hash", "ascending"),
             ("doc_id", "ascending")]
        )
        src = g.column("source").to_numpy(zero_copy_only=False)
        chars = g.column("n_chars").to_numpy(zero_copy_only=False)
        cum = np.cumsum(chars)
        # rebase the running sum at each source boundary
        starts = np.flatnonzero(
            np.concatenate([[True], src[1:] != src[:-1]])
        )
        base = np.zeros(len(chars), dtype=cum.dtype)
        base[starts[1:]] = cum[starts[1:] - 1]
        np.maximum.accumulate(base, out=base)
        keep = (cum - base) <= BUDGET
        return g.filter(pa.array(keep)).select(["doc_id", "source"])

    rows = keyed_window(ds.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True
    ), "src_h", per_bucket).take_all()
    return _from_rows(
        rows, {"doc_id": pa.int64(), "source": pa.string()}
    ).sort_by("doc_id")


ORACLE_MIX = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         sum(n_chars) OVER (
           PARTITION BY source
           ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id
         ) AS cum
  FROM documents
) WHERE cum <= 120000 ORDER BY doc_id
"""


def q_contamination_documents(sf_dir: str) -> pa.Table:
    """Benchmark-contamination scan: corpus docs sharing any 5-token
    shingle with the eval set (doc_id % 11 == 0 — a held-out slice).
    Distributed: the eval side is SMALL by construction (a benchmark,
    not a corpus), so its shingle set broadcasts once via ray.put and
    each corpus batch probes it with one vectorized is_in — zero
    shuffle.  Past ~10M eval shingles the same pipeline switches to a
    shingle-hash semi-join (the exact_dedup keep-list pattern)."""
    W = 5
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def shingles_vec(t: pa.Table) -> pa.Table:
        """Vectorized shingling: flatten tokens once, join W parallel
        shifted views (one binary_join_element_wise call), mask windows
        that cross document boundaries via segment offsets."""
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")), pattern=r"\W+"
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ok = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(ok))
        parent = parent[ok]
        n = len(flat)
        if n < W:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "shingle": pa.array([], pa.string())}
            )
        views = [flat.slice(j, n - W + 1) for j in range(W)]
        sh = pc.binary_join_element_wise(*views, " ")
        # a window is valid only if its first and last token share a doc
        valid = parent[: n - W + 1] == parent[W - 1 :]
        doc = pc.take(
            t.column("doc_id"), pa.array(parent[: n - W + 1], pa.int64())
        )
        return pa.table({"doc_id": doc, "shingle": sh}).filter(pa.array(valid))

    # eval side: small by construction — collect its distinct shingles
    def eval_only(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 11 == 0))

    eval_sh = (
        ds.map_batches(eval_only, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(shingles_vec, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    eval_set = pa.array(
        sorted({r["shingle"] for r in eval_sh}), pa.string()
    )
    import ray as _ray

    eval_ref = _ray.put(eval_set)

    def probe(t: pa.Table) -> pa.Table:
        sh = shingles_vec(t)
        ids = sh.column("doc_id").to_numpy(zero_copy_only=False)
        sh = sh.filter(pa.array(ids % 11 != 0))
        hit = pc.is_in(sh.column("shingle"), value_set=_ray.get(eval_ref))
        docs = sh.filter(hit).column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(np.unique(docs), pa.int64())})

    rows = ds.map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    ids = sorted({int(r["doc_id"]) for r in rows})
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


ORACLE_CONTAMINATION = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_extract_all(lower(text), '\w+'),
                     x -> length(x) > 0) AS ts
  FROM documents
), sh AS (
  SELECT doc_id, array_to_string(ts[i:i+4], ' ') AS shingle
  FROM toks JOIN range(1, 4096) t(i) ON t.i <= greatest(0, len(ts) - 4)
)
SELECT DISTINCT c.doc_id FROM sh c
WHERE c.doc_id % 11 <> 0
  AND EXISTS (SELECT 1 FROM sh e
              WHERE e.doc_id % 11 = 0 AND e.shingle = c.shingle)
ORDER BY doc_id
"""


def q_bm25_search(sf_dir: str) -> pa.Table:
    """BM25 top-20 for a fixed query — the retrieval primitive over
    the corpus (Robertson/Spärck Jones weighting, k1=1.2 b=0.75).
    Distributed: ONE streaming pass computes per-doc (dl, tf_t) with
    RE2 kernels (only query terms are counted — the inverted-index
    pruning happens at scan time); corpus stats (N, sum dl, df_t) are
    integer partials summed driver-side (a handful of ints per batch);
    scoring + partial top-k runs in a second pruned pass over docs
    with any hit.  Float determinism: every input to the double-math
    score is an INTEGER (tf, dl, N, df, sum_dl), added in fixed term
    order — bit-identical to the SQL oracle's expression tree."""
    TERMS = ("data", "model", "training")
    K1, B = 1.2, 0.75
    K = 20
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.fill_null(t.column("text"), ""))
        cols = {
            "doc_id": t.column("doc_id"),
            "dl": pc.count_substring_regex(low, pattern=r"\w+").cast(pa.int64()),
        }
        for term in TERMS:
            cols[f"tf_{term}"] = pc.count_substring_regex(
                low, pattern=rf"\b{term}\b"
            ).cast(pa.int64())
        return pa.table(cols)

    st = ds.map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def partials(t: pa.Table) -> pa.Table:
        row = {"n": [t.num_rows], "sum_dl": [int(pc.sum(t.column("dl")).as_py() or 0)]}
        for term in TERMS:
            row[f"df_{term}"] = [
                int(
                    pc.sum(
                        pc.greater(t.column(f"tf_{term}"), 0).cast(pa.int64())
                    ).as_py()
                    or 0
                )
            ]
        return pa.table(row)

    agg = pa.Table.from_pylist(
        st.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
    )
    N = int(pc.sum(agg.column("n")).as_py())
    sum_dl = int(pc.sum(agg.column("sum_dl")).as_py())
    avgdl = sum_dl / N
    idf = {
        term: np.log(
            (N - int(pc.sum(agg.column(f"df_{term}")).as_py()) + 0.5)
            / (int(pc.sum(agg.column(f"df_{term}")).as_py()) + 0.5)
            + 1.0
        )
        for term in TERMS
    }

    def score(t: pa.Table) -> pa.Table:
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.zeros(t.num_rows, dtype=np.float64)
        # expression tree mirrors ORACLE_BM25 token-for-token (literal
        # 2.2/0.25/0.75, dl/avgdl grouped) so doubles stay bit-equal
        norm = K1 * (0.25 + 0.75 * (dl / avgdl))
        for term in TERMS:
            tf = (
                t.column(f"tf_{term}")
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
            s = s + idf[term] * (tf * 2.2) / (tf + norm)
        out = t.append_column("score", pa.array(s, pa.float64()))
        out = out.filter(pa.array(s > 0))
        # partial top-k per batch (score desc, doc_id asc tie-break)
        return out.sort_by(
            [("score", "descending"), ("doc_id", "ascending")]
        ).slice(0, K)

    rows = (
        st.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    t = _from_rows(
        rows,
        {"doc_id": pa.int64(), "dl": pa.int64(),
         **{f"tf_{term}": pa.int64() for term in TERMS},
         "score": pa.float64()},
    )
    return t.sort_by(
        [("score", "descending"), ("doc_id", "ascending")]
    ).slice(0, K)


ORACLE_BM25 = r"""
WITH stats AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '\w+')) AS dl,
         len(regexp_extract_all(lower(text), '\bdata\b')) AS tf_data,
         len(regexp_extract_all(lower(text), '\bmodel\b')) AS tf_model,
         len(regexp_extract_all(lower(text), '\btraining\b')) AS tf_training
  FROM documents
), g AS (
  SELECT count(*) AS n, sum(dl) AS sum_dl,
         count(*) FILTER (tf_data > 0) AS df_data,
         count(*) FILTER (tf_model > 0) AS df_model,
         count(*) FILTER (tf_training > 0) AS df_training
  FROM stats
)
SELECT doc_id, dl, tf_data, tf_model, tf_training,
       ln((n - df_data + 0.5) / (df_data + 0.5) + 1.0)
         * (tf_data * 2.2) / (tf_data + 1.2 * (0.25 + 0.75 * (dl / (sum_dl / n))))
     + ln((n - df_model + 0.5) / (df_model + 0.5) + 1.0)
         * (tf_model * 2.2) / (tf_model + 1.2 * (0.25 + 0.75 * (dl / (sum_dl / n))))
     + ln((n - df_training + 0.5) / (df_training + 0.5) + 1.0)
         * (tf_training * 2.2)
           / (tf_training + 1.2 * (0.25 + 0.75 * (dl / (sum_dl / n))))
       AS score
FROM stats, g
WHERE tf_data > 0 OR tf_model > 0 OR tf_training > 0
ORDER BY score DESC, doc_id LIMIT 20
"""


def q_redact_pii_documents(sf_dir: str) -> pa.Table:
    """PII redaction — the write side of the pii_scan pre-pass: replace
    emails/URLs/IPv4/long digit runs with typed placeholders, emit the
    redacted text + per-doc replacement count.  One compiled-RE2
    replace kernel per pattern, fully vectorized, embarrassingly
    parallel (no shuffle); patterns AND application order are shared
    verbatim with the SQL oracle (order matters — a URL can contain
    digits)."""
    from ...functions.text import PII_PATTERNS

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    order = ["n_emails", "n_urls", "n_ipv4", "n_long_digits"]
    marks = {"n_emails": "[EMAIL]", "n_urls": "[URL]",
             "n_ipv4": "[IP]", "n_long_digits": "[NUM]"}

    def redact(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t.column("text"), "")
        total = np.zeros(t.num_rows, dtype=np.int64)
        for name in order:
            pat = PII_PATTERNS[name]
            total += (
                pc.count_substring_regex(text, pattern=pat)
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            text = pc.replace_substring_regex(
                text, pattern=pat, replacement=marks[name]
            )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "redacted": text,
                "n_redactions": pa.array(total, pa.int64()),
            }
        )

    return ds.map_batches(redact, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_REDACT = r"""
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        'https?://[^\s]+', '[URL]', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
    '\d{9,}', '[NUM]', 'g') AS redacted,
  len(regexp_extract_all(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
  + len(regexp_extract_all(
      regexp_replace(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      'https?://[^\s]+'))
  + len(regexp_extract_all(
      regexp_replace(
        regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        'https?://[^\s]+', '[URL]', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
  + len(regexp_extract_all(
      regexp_replace(
        regexp_replace(
          regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
          'https?://[^\s]+', '[URL]', 'g'),
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
      '\d{9,}')) AS n_redactions
FROM documents
"""


def q_token_rarity_documents(sf_dir: str) -> pa.Table:
    """Unigram-LM rarity filter (the integer-exact core of CCNet-style
    perplexity filtering): per doc, the SUM of the corpus-wide counts
    of its tokens plus its token count — docs whose mean token
    frequency (sum_freq / n_tokens) is low are rare/OOD, high are
    boilerplate-like.  Both outputs are INTEGERS, so the parity hash
    is exact where a float mean-log-prob would be association-
    sensitive.  Distributed shape: corpus token counts via per-batch
    partial counts + one keyed fold (the top_tokens exchange); the
    count table broadcasts via ray.put while small (here: a pooled
    vocab), switching to a token-hash semi-join at web-scale vocab —
    the per-doc pass is then index_in + one segment reduceat, no row
    loops."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tok_counts(t: pa.Table) -> pa.Table:
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

    partial_rows = ds.map_batches(
        tok_counts, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    counts = (
        pa.Table.from_pylist(partial_rows)
        .group_by("token")
        .aggregate([("n", "sum")])
        .rename_columns(["token", "n"])
    )
    import ray as _ray

    vocab_ref = _ray.put(counts.column("token").combine_chunks())
    n_ref = _ray.put(
        counts.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    )

    def rarity(t: pa.Table) -> pa.Table:
        vocab, nvec = _ray.get(vocab_ref), _ray.get(n_ref)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")), pattern=r"\W+"
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ok = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        flat, parent = flat.filter(pa.array(ok)), parent[ok]
        idx = pc.index_in(flat, value_set=vocab).to_numpy(zero_copy_only=False)
        freqs = nvec[idx.astype(np.int64)]
        sum_freq = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(sum_freq, parent, freqs)
        n_tok = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(n_tok, parent, 1)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "sum_freq": pa.array(sum_freq, pa.int64()),
            }
        )

    return ds.map_batches(rarity, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_RARITY = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS token
  FROM documents
), cnt AS (
  SELECT token, count(*) AS n FROM tok GROUP BY token
)
SELECT doc_id, count(*) AS n_tokens, sum(n)::BIGINT AS sum_freq
FROM tok JOIN cnt USING (token)
GROUP BY doc_id
"""


def q_repetition_stats_documents(sf_dir: str) -> pa.Table:
    """Within-document repetition (Gopher-rule quality signal): total
    vs distinct 4-token shingles per doc — a high duplicate fraction
    marks looping/boilerplate generations.  Integer outputs keep the
    parity hash exact.  Vectorized: shingles come from W shifted views
    of the flattened token stream joined in ONE kernel call; per-doc
    distinct counting is a batch-local group_by over (doc, shingle)
    (docs never span batches), no row loops, no shuffle."""
    W = 4
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")), pattern=r"\W+"
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ok = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        flat, parent = flat.filter(pa.array(ok)), parent[ok]
        n = len(flat)
        n_sh = np.zeros(t.num_rows, dtype=np.int64)
        n_distinct = np.zeros(t.num_rows, dtype=np.int64)
        if n >= W:
            views = [flat.slice(j, n - W + 1) for j in range(W)]
            sh = pc.binary_join_element_wise(*views, " ")
            valid = parent[: n - W + 1] == parent[W - 1 :]
            doc_row = parent[: n - W + 1][valid]
            sh = sh.filter(pa.array(valid))
            np.add.at(n_sh, doc_row, 1)
            uniq = (
                pa.table(
                    {"row": pa.array(doc_row, pa.int64()), "sh": sh}
                )
                .group_by(["row", "sh"])
                .aggregate([])
            )
            rows = uniq.column("row").to_numpy(zero_copy_only=False)
            np.add.at(n_distinct, rows.astype(np.int64), 1)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_shingles": pa.array(n_sh, pa.int64()),
                "n_distinct_shingles": pa.array(n_distinct, pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_REPETITION = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ts
  FROM documents
), sh AS (
  SELECT doc_id, array_to_string(ts[i:i+3], ' ') AS shingle
  FROM toks JOIN range(1, 4096) t(i) ON t.i <= greatest(0, len(ts) - 3)
)
SELECT d.doc_id,
       coalesce(s.n_shingles, 0) AS n_shingles,
       coalesce(s.n_distinct_shingles, 0) AS n_distinct_shingles
FROM documents d LEFT JOIN (
  SELECT doc_id, count(*) AS n_shingles,
         count(DISTINCT shingle) AS n_distinct_shingles
  FROM sh GROUP BY doc_id
) s USING (doc_id)
"""


def q_compression_ratio_documents(sf_dir: str) -> pa.Table:
    """zlib compressibility (the Gopher/FineWeb repetitiveness
    signal): highly repetitive or templated text compresses far below
    natural prose, so `gz_bytes / raw_bytes` is a cheap quality score
    that needs no tokenizer or model.  Per-doc compression is inherent
    (zlib is a sequential codec) but runs at C speed over memoryview
    slices of the Arrow flat buffer — no Python string materializes.
    No SQL twin (DuckDB has no zlib scalar), so this entry is
    rows-only at the gate; determinism is pinned by zlib level 6."""
    import zlib

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def ratio(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.fill_null(txt, "")
        n = len(txt)
        offs = np.frombuffer(
            txt.buffers()[1], np.int32, count=n + 1, offset=txt.offset * 4
        ).astype(np.int64)
        mv = memoryview(txt.buffers()[2] or b"")
        gz = np.fromiter(
            (
                len(zlib.compress(mv[s:e], 6))
                for s, e in zip(offs[:-1], offs[1:])
            ),
            np.int64,
            count=n,
        )
        raw = offs[1:] - offs[:-1]
        with np.errstate(divide="ignore", invalid="ignore"):
            r = gz.astype(np.float64) / raw.astype(np.float64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "raw_bytes": pa.array(raw, pa.int64()),
                "gz_bytes": pa.array(gz, pa.int64()),
                # empty docs: no bytes, no signal -> null
                "ratio": pa.Array.from_pandas(
                    np.where(raw == 0, np.nan, r)
                ).cast(pa.float64()),
            }
        )

    return ds.map_batches(ratio, batch_format="pyarrow", zero_copy_batch=True)


def q_dup_ngrams_documents(sf_dir: str) -> pa.Table:
    """Cross-document duplicated-span signal (the core statistic of
    exact-substring training-data dedup, Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better"): per document, how
    many of its word-4-shingles (with multiplicity) also occur in at
    least one OTHER document.  A high dup fraction marks mirrored /
    templated / licensed-text spans that substring dedup would cut.

    Fully distributed in two bounded-bucket shuffles, mirroring
    `ngram_jaccard_pairs`: batch pass emits one row per (doc, shingle)
    with its in-doc multiplicity (docs never span batches, so the
    multiplicity is complete batch-side; 64-bit hashed shingles stand
    in for strings — collision odds (#shingles)^2/2^64 ≈ 0) → shingle-
    hash bucket exchange where a vectorized run count marks shingles
    seen in ≥2 docs and folds per-doc partials → doc-hash bucket
    exchange sums the ≤NB partials per doc.  Zero-shingle docs ride a
    sentinel row so every document emits exactly one output row.
    Integer outputs → exact SQL parity."""
    from ...functions.text import token_hash_stream

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    W = 4
    NB = 64
    DB = 32

    def shingle_rows(t: pa.Table) -> pa.Table:
        docs = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h, parents = token_hash_stream(t.column("text"))
        sh = np.zeros(0, np.int64)
        shp = np.zeros(0, np.int64)
        if len(h) >= W:
            K = np.uint64(1099511628211)
            m = len(h) - W + 1
            acc = np.zeros(m, dtype=np.uint64)
            for j in range(W):
                acc = acc * K + h[j : m + j]
            valid = parents[:m] == parents[W - 1 :]
            sh = (acc[valid] >> np.uint64(1)).astype(np.int64)
            shp = parents[:m][valid]
        # per-(doc,shingle) multiplicity, batch-local
        if len(sh):
            order = np.lexsort((sh, shp))
            sh, shp = sh[order], shp[order]
            starts = np.flatnonzero(
                np.concatenate(([True], (sh[1:] != sh[:-1]) | (shp[1:] != shp[:-1])))
            )
            mult = np.diff(np.concatenate((starts, [len(sh)])))
            sh, shp = sh[starts], shp[starts]
        else:
            mult = np.zeros(0, np.int64)
        doc_ids = docs[shp] if len(sh) else np.zeros(0, np.int64)
        return pa.table(
            {
                "s": pa.array(
                    np.concatenate((sh, np.full(len(docs), -1, np.int64))),
                    pa.int64(),
                ),
                "doc_id": pa.array(
                    np.concatenate((doc_ids, docs)), pa.int64()
                ),
                "m": pa.array(
                    np.concatenate((mult, np.zeros(len(docs), np.int64))),
                    pa.int64(),
                ),
                "__b": pa.array(
                    np.concatenate((sh % NB, docs % NB)), pa.int64()
                ),
            }
        )

    def bucket_fold(group: pa.Table) -> pa.Table:
        s = group.column("s").to_numpy(zero_copy_only=False)
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        m = group.column("m").to_numpy(zero_copy_only=False)
        sent = s == -1
        real = ~sent
        out_doc = [doc[sent]]
        out_tot = [np.zeros(int(sent.sum()), np.int64)]
        out_dup = [np.zeros(int(sent.sum()), np.int64)]
        if real.any():
            rs, rd, rm = s[real], doc[real], m[real]
            order = np.lexsort((rd, rs))
            rs, rd, rm = rs[order], rd[order], rm[order]
            starts = np.flatnonzero(np.concatenate(([True], rs[1:] != rs[:-1])))
            lens = np.diff(np.concatenate((starts, [len(rs)])))
            dup_run = np.repeat(lens >= 2, lens)
            uniq, inv = np.unique(rd, return_inverse=True)
            tot = np.zeros(len(uniq), np.int64)
            dup = np.zeros(len(uniq), np.int64)
            np.add.at(tot, inv, rm)
            np.add.at(dup, inv, np.where(dup_run, rm, 0))
            out_doc.append(uniq)
            out_tot.append(tot)
            out_dup.append(dup)
        d = np.concatenate(out_doc)
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "tot": pa.array(np.concatenate(out_tot), pa.int64()),
                "dup": pa.array(np.concatenate(out_dup), pa.int64()),
                "__db": pa.array(d % DB, pa.int64()),
            }
        )

    def doc_fold(group: pa.Table) -> pa.Table:
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        tot = group.column("tot").to_numpy(zero_copy_only=False)
        dup = group.column("dup").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(doc, return_inverse=True)
        t = np.zeros(len(uniq), np.int64)
        u = np.zeros(len(uniq), np.int64)
        np.add.at(t, inv, tot)
        np.add.at(u, inv, dup)
        return pa.table(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "n_shingles": pa.array(t, pa.int64()),
                "n_dup_shingles": pa.array(u, pa.int64()),
            }
        )

    return (
        ds.map_batches(shingle_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(bucket_fold, batch_format="pyarrow")
        .groupby("__db")
        .map_groups(doc_fold, batch_format="pyarrow")
    )


ORACLE_DUP_NGRAMS = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ts
  FROM documents
), sh AS (
  SELECT doc_id, array_to_string(ts[i:i+3], ' ') AS shingle
  FROM toks JOIN range(1, 4096) t(i) ON t.i <= greatest(0, len(ts) - 3)
), g AS (
  SELECT shingle, count(DISTINCT doc_id) AS nd FROM sh GROUP BY shingle
)
SELECT d.doc_id,
       coalesce(s.n_shingles, 0) AS n_shingles,
       coalesce(s.n_dup_shingles, 0) AS n_dup_shingles
FROM documents d LEFT JOIN (
  SELECT sh.doc_id, count(*) AS n_shingles,
         sum(CASE WHEN g.nd > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_shingles
  FROM sh JOIN g USING (shingle) GROUP BY sh.doc_id
) s USING (doc_id)
"""


def q_remove_dup_spans_documents(sf_dir: str) -> pa.Table:
    """Exact-substring span REMOVAL — the action half of the Lee et
    al. 2022 dedup whose statistic `dup_ngrams_documents` computes:
    every word position covered by a word-4-shingle occurrence that is
    a non-first duplicate (the gram occurs >1 times corpus-wide, and
    this occurrence is not the lexicographically-first (doc, pos)) is
    cut; documents are rebuilt from the surviving tokens.  Keeping the
    FIRST occurrence is what makes the rule deterministic and
    SQL-mirrorable.

    Scale shape: O(tokens) occurrence rows is inherent to exact-
    substring dedup (the paper builds a corpus suffix array — also
    O(tokens)); here it is two bounded-bucket shuffles. Batch pass
    emits one row per shingle occurrence (hash stands in for the gram,
    collision odds (#grams)^2/2^64 ≈ 0) → shingle-hash buckets mark
    non-first members of each hash run (vectorized lexsort + run
    scan) → removal rows and the original docs meet in doc-hash
    buckets where ONE vectorized pass per bucket (interval delta +
    cumsum cover mask + reduceat offsets + Arrow binary_join) rebuilds
    every doc's text.  No per-doc Python, no full-corpus state."""
    from ...functions.text import token_hash_stream, token_strings

    W = 4
    NB = 64
    DB = 32

    def occurrence_rows(t: pa.Table) -> pa.Table:
        docs = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h, parents = token_hash_stream(t.column("text"))
        sh = np.zeros(0, np.int64)
        shp = np.zeros(0, np.int64)
        pos = np.zeros(0, np.int64)
        if len(h) >= W:
            K = np.uint64(1099511628211)
            m = len(h) - W + 1
            acc = np.zeros(m, dtype=np.uint64)
            for j in range(W):
                acc = acc * K + h[j : m + j]
            valid = parents[:m] == parents[W - 1 :]
            sh = (acc[valid] >> np.uint64(1)).astype(np.int64)
            shp = parents[:m][valid]
            # within-doc 0-based token position of each shingle start:
            # absolute index minus the doc's first absolute index
            starts = np.flatnonzero(
                np.concatenate(([True], parents[1:] != parents[:-1]))
            )
            first_abs = np.repeat(starts, np.diff(np.concatenate((starts, [len(parents)]))))
            pos = (np.arange(len(parents), dtype=np.int64) - first_abs)[:m][valid]
        return pa.table(
            {
                "s": pa.array(sh, pa.int64()),
                "doc_id": pa.array(docs[shp] if len(sh) else shp, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "__db": pa.array(sh % NB, pa.int64()),
            }
        )

    def mark_nonfirst(group: pa.Table) -> pa.Table:
        s = group.column("s").to_numpy(zero_copy_only=False)
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        pos = group.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, doc, s))
        s, doc, pos = s[order], doc[order], pos[order]
        first_of_run = np.concatenate(([True], s[1:] != s[:-1]))
        run_len = np.diff(
            np.concatenate((np.flatnonzero(first_of_run), [len(s)]))
        )
        in_dup_run = np.repeat(run_len > 1, run_len)
        # non-first members of every >1 run (the first occurrence of a
        # duplicated gram is KEPT, all later (doc,pos) are cut)
        cut = in_dup_run & ~first_of_run
        doc, pos = doc[cut], pos[cut]
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "text": pa.nulls(len(doc), pa.string()),
                "__b": pa.array(doc % DB, pa.int64()),
            }
        )

    def doc_rows(t: pa.Table) -> pa.Table:
        docs = t.column("doc_id").cast(pa.int64())
        d = docs.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": docs,
                "pos": pa.array(np.full(len(d), -1, np.int64), pa.int64()),
                "text": t.column("text"),
                "__b": pa.array(d % DB, pa.int64()),
            }
        )

    def rebuild(group: pa.Table) -> pa.Table:
        is_doc = pc.equal(group.column("pos"), -1)
        d_rows = group.filter(is_doc)
        r_rows = group.filter(pc.invert(is_doc))
        flat, parents = token_strings(d_rows.column("text"))
        n_docs = d_rows.num_rows
        counts = np.zeros(n_docs, np.int64)
        if len(parents):
            np.add.at(counts, parents, 1)
        offsets = np.concatenate(([0], np.cumsum(counts)))
        delta = np.zeros(len(flat) + 1, np.int64)
        if r_rows.num_rows:
            ridx = pc.index_in(
                r_rows.column("doc_id"), d_rows.column("doc_id")
            ).to_numpy(zero_copy_only=False)
            g = offsets[ridx] + r_rows.column("pos").to_numpy(
                zero_copy_only=False
            )
            np.add.at(delta, g, 1)
            np.add.at(delta, g + W, -1)
        covered = np.cumsum(delta[:-1]) > 0
        keep = ~covered
        cs = np.concatenate(([0], np.cumsum(keep, dtype=np.int64)))
        kept_counts = cs[offsets[1:]] - cs[offsets[:-1]]
        new_offsets = np.concatenate(([0], np.cumsum(kept_counts)))
        kept = flat.filter(pa.array(keep)) if len(flat) else flat
        if isinstance(kept, pa.ChunkedArray):
            kept = kept.combine_chunks()
        lists = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()), kept
        )
        return pa.table(
            {
                "doc_id": d_rows.column("doc_id"),
                "text_dedup": pc.binary_join(lists, " "),
                "n_removed": pa.array(counts - kept_counts, pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    removals = (
        ds.map_batches(occurrence_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__db")
        .map_groups(mark_nonfirst, batch_format="pyarrow")
    )
    docs = ds.map_batches(doc_rows, batch_format="pyarrow", zero_copy_batch=True)
    return (
        removals.union(docs)
        .groupby("__b")
        .map_groups(
            lambda g: rebuild(g.drop_columns(["__b"])), batch_format="pyarrow"
        )
    )


ORACLE_REMOVE_DUP_SPANS = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ts
  FROM documents
), sh AS (
  SELECT doc_id, i AS p, array_to_string(ts[i:i+3], ' ') AS shingle
  FROM toks JOIN range(1, 4096) t(i) ON t.i <= greatest(0, len(ts) - 3)
), cnt AS (
  SELECT shingle, count(*) AS c, min(doc_id * 1000000 + p) AS fk
  FROM sh GROUP BY shingle
), dupocc AS (
  SELECT s.doc_id, s.p FROM sh s JOIN cnt USING (shingle)
  WHERE cnt.c > 1 AND s.doc_id * 1000000 + s.p <> cnt.fk
), words AS (
  SELECT doc_id, i AS pos, ts[i] AS word
  FROM toks JOIN range(1, 4096) r(i) ON r.i <= len(ts)
), removed AS (
  SELECT DISTINCT w.doc_id, w.pos
  FROM words w JOIN dupocc o
    ON o.doc_id = w.doc_id AND w.pos BETWEEN o.p AND o.p + 3
)
SELECT t.doc_id,
       coalesce(
         string_agg(w.word, ' ' ORDER BY w.pos)
           FILTER (WHERE w.pos IS NOT NULL AND r.pos IS NULL),
         '') AS text_dedup,
       count(r.pos)::BIGINT AS n_removed
FROM toks t
LEFT JOIN words w USING (doc_id)
LEFT JOIN removed r ON r.doc_id = w.doc_id AND r.pos = w.pos
GROUP BY t.doc_id
"""


def q_tfidf_top_terms(sf_dir: str) -> pa.Table:
    """Per-document keyword extraction: top-3 terms by tf·idf over the
    FULL corpus vocabulary (idf = ln((N+1)/(df+1)) + 1, ties → term
    asc).  Unlike `bm25_search` (3 fixed query terms, doc ranking),
    this ranks every term of every doc — the keyword/tag primitive.

    Two bounded-bucket shuffles, df computed IN the term bucket it
    already lives in: batch pass emits one row per distinct (doc,
    term) with its tf (docs never span batches) → term-hash buckets
    hold every occurrence of a term, so df is a run length and rides
    back attached to the same rows (no second scan, no driver dict) →
    doc-hash buckets score and take the per-doc top-3 with ONE Arrow
    sort + run-rank per bucket.  Floats: integer tf/df/N enter the
    double expression in the oracle's exact tree shape."""
    from ...functions.text import token_strings

    NB = 64
    DB = 32
    TOPK = 3
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()

    def term_rows(t: pa.Table) -> pa.Table:
        docs = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        flat, parents = token_strings(t.column("text"))
        tb = pa.table(
            {"term": flat, "doc_id": pa.array(docs[parents], pa.int64())}
        ).sort_by([("term", "ascending"), ("doc_id", "ascending")])
        term = tb.column("term").combine_chunks()
        did = tb.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(did)
        if n == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                    "__b": pa.array([], pa.int64()),
                }
            )
        neq = pc.not_equal(term.slice(1), term.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        first = np.concatenate(([True], neq | (did[1:] != did[:-1])))
        starts = np.flatnonzero(first)
        tf = np.diff(np.concatenate((starts, [n])))
        out_term = term.take(pa.array(starts, pa.int64()))
        h = key_hash64(out_term)
        return pa.table(
            {
                "term": out_term,
                "doc_id": pa.array(did[starts], pa.int64()),
                "tf": pa.array(tf, pa.int64()),
                "__b": pa.array(
                    (h % np.uint64(NB)).astype(np.int64), pa.int64()
                ),
            }
        )

    def attach_df(group: pa.Table) -> pa.Table:
        tb = group.sort_by([("term", "ascending")])
        term = tb.column("term").combine_chunks()
        n = len(term)
        neq = pc.not_equal(term.slice(1), term.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.flatnonzero(np.concatenate(([True], neq)))
        run = np.diff(np.concatenate((starts, [n])))
        df = np.repeat(run, run)  # (doc,term) rows are globally unique
        did = tb.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "term": term,
                "doc_id": tb.column("doc_id"),
                "tf": tb.column("tf"),
                "df": pa.array(df, pa.int64()),
                "__db": pa.array(did % DB, pa.int64()),
            }
        )

    def topk(group: pa.Table) -> pa.Table:
        tf = group.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        df = group.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        # mirrors the oracle tree: tf * (ln((N+1.0)/(df+1.0)) + 1.0)
        score = tf * (np.log((n_docs + 1.0) / (df + 1.0)) + 1.0)
        tb = group.append_column("score", pa.array(score, pa.float64())).sort_by(
            [
                ("doc_id", "ascending"),
                ("score", "descending"),
                ("term", "ascending"),
            ]
        )
        did = tb.column("doc_id").to_numpy(zero_copy_only=False)
        first = np.concatenate(([True], did[1:] != did[:-1]))
        idx = np.arange(len(did), dtype=np.int64)
        rank = idx - np.maximum.accumulate(np.where(first, idx, 0)) + 1
        keep = rank <= TOPK
        tb = tb.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": tb.column("doc_id"),
                "term": tb.column("term"),
                "rank": pa.array(rank[keep], pa.int64()),
                "tf": tb.column("tf"),
                "df": tb.column("df"),
                "score": tb.column("score"),
            }
        )

    return (
        ds.map_batches(term_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(
            lambda g: attach_df(g.drop_columns(["__b"])), batch_format="pyarrow"
        )
        .groupby("__db")
        .map_groups(
            lambda g: topk(g.drop_columns(["__db"])), batch_format="pyarrow"
        )
    )


ORACLE_TFIDF = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), sc AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * (ln(((SELECT count(*) FROM documents) + 1.0) / (df.df + 1.0)) + 1.0)
           AS score
  FROM tf JOIN df USING (term)
), r AS (
  SELECT *, row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term
         ) AS rank
  FROM sc
)
SELECT doc_id, term, rank::BIGINT AS rank, tf, df, score
FROM r WHERE rank <= 3
"""


def q_pca_embeddings(sf_dir: str) -> pa.Table:
    """Exact distributed PCA projection (top-2) of the embeddings
    table — fit = ONE moment-partial scan (count/sum/Gram per block,
    d×d driver eigh), project = one matmul pass. Eigendecomposition →
    no SQL oracle (rows-only gate); exactness vs single-process numpy
    PCA (same sign convention, 1e-9) is tested in test_functions.py."""
    from ...functions.similarity import pca_embeddings

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return pca_embeddings(ds, n_components=2)


def q_kmeans_embeddings(sf_dir: str) -> pa.Table:
    """Distributed Lloyd's k-means assignment over the embeddings
    table (SemDeDup / cluster-balanced-sampling primitive) — see
    `functions.similarity.kmeans_embeddings` for the combiner shape.
    Iterative model fit → no SQL oracle (rows-only gate); exactness is
    covered by the planted-blob recovery + numpy-Lloyd equivalence
    tests in tests/test_functions.py."""
    from ...functions.similarity import kmeans_embeddings

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_embeddings(ds, k=8, iters=6)


def q_semdedup_embeddings(sf_dir: str) -> pa.Table:
    """SemDeDup semantic near-dup pairs: k-means fit + within-cluster
    cosine ≥ tau (see `functions.similarity.semdedup_pairs`).  Model-
    fit composite → rows-only gate; the within-cluster restriction is
    recall-tested against the EXACT block-pair operator on a clustered
    fixture in tests/test_functions.py.  tau matches the fixture's
    low-similarity regime (like `embedding_neardup`); on this
    near-random data the intra-cluster restriction keeps only the
    same-cluster subset of the exact tau=0.4 pairs — the documented
    SemDeDup trade (real corpora cluster; this fixture barely does)."""
    from ...functions.similarity import semdedup_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semdedup_pairs(ds, k=8, iters=6, tau=0.4)


def q_sort_events(sf_dir: str) -> pa.Table:
    """Global ORDER BY (value DESC, event_id) with exact 1-based ranks —
    the reference delegates insert-time ORDER BY to ClickHouse
    (reference src/ch_eth/sync.rs DDLs); here the engine owns it as a
    sampled range-partitioned sort (functions/sort.py): one sample
    pass, ONE row exchange, per-range numpy lexsort, ranks from a
    driver-side R-int prefix.  Never `Dataset.sort` (full-table
    all-to-all with no rank output)."""
    from ...functions.sort import range_partitioned_sort

    ds = _read(sf_dir, "events", ["event_id", "value"])
    out = range_partitioned_sort(
        ds, "value", descending=True, tiebreak_col="event_id"
    )
    return out.map_batches(
        lambda t: t.select(["event_id", "value", "sort_rank"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


ORACLE_SORT_EVENTS = """
SELECT event_id, value,
       row_number() OVER (ORDER BY value DESC, event_id) AS sort_rank
FROM events
"""


def q_equidepth_bins_value(sf_dir: str) -> pa.Table:
    """Exact equi-depth binning: ntile(16) over the global (value,
    event_id) order — the quantile-bucket primitive behind balanced
    range layouts and histogram-equalized features.  Rides the same
    range sort; the bin is pure arithmetic on the exact global rank."""
    from ...functions.sort import global_ntile

    ds = _read(sf_dir, "events", ["event_id", "value"])
    out = global_ntile(ds, "value", 16, tiebreak_col="event_id")
    return out.map_batches(
        lambda t: t.select(["event_id", "bin"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


ORACLE_EQUIDEPTH = """
SELECT event_id,
       ntile(16) OVER (ORDER BY value, event_id) AS bin
FROM events
"""


def q_dsir_sample_documents(sf_dir: str) -> pa.Table:
    """DSIR data selection (Xie et al. 2023): pick the 500 docs whose
    hashed-unigram distribution best matches the English subcorpus
    (target = lang='en'), by importance log-ratio on 4096 hashed
    features + Gumbel top-k (see functions/importance.py — two
    streaming passes + a batches×k partial top-k; driver holds one
    4096-float vector).  Hash-feature scoring is not SQL-expressible →
    rows-only gate; exactness vs a single-process reference and
    split-invariance are pinned in tests/test_importance.py."""
    from ...functions.importance import dsir_select

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    flagged = ds.map_batches(
        lambda t: t.append_column(
            "is_target", pc.equal(t.column("lang"), "en")
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return dsir_select(flagged, target_col="is_target", k=500,
                       buckets=4096)


def q_zorder_scan_events(sf_dir: str) -> pa.Table:
    """Multi-column zone-map scan over a Z-order-clustered copy of the
    events table (functions/zorder.py): stage events once as Morton-
    range files on (value, user_id), then answer a rectangle predicate
    by pruning Parquet footer stats of BOTH columns before any task
    runs, + an exact vectorized row filter.  The key-sorted lake files
    can only zone-map ONE column; this is the layout for the other
    access path.  Pruning effectiveness (vs a single-sorted layout) is
    asserted in tests/test_zorder.py; this gate entry pins the exact
    rectangle result against SQL."""
    from ...functions.zorder import zorder_scan, zorder_write

    tag = hashlib.blake2b(sf_dir.encode(), digest_size=6).hexdigest()
    out_dir = f"/tmp/w3r_zorder/{tag}"
    marker = os.path.join(out_dir, "z-00000.parquet")
    if not os.path.exists(marker):
        zorder_write(
            _read(sf_dir, "events", ["event_id", "user_id", "value"]),
            out_dir,
            ("value", "user_id"),
        )
    ds, _read_n, _tot = zorder_scan(
        out_dir,
        [
            ("value", ">=", 25.0),
            ("value", "<=", 75.0),
            ("user_id", ">=", 3),
            ("user_id", "<=", 40),
        ],
        columns=["event_id", "user_id", "value"],
    )
    return ds


ORACLE_ZORDER_SCAN = """
SELECT event_id, user_id, value FROM events
WHERE value >= 25.0 AND value <= 75.0
  AND user_id >= 3 AND user_id <= 40
"""


def q_spelling_variants_part(sf_dir: str) -> pa.Table:
    """Fuzzy token matching: all vocabulary pairs of the part-name
    corpus at edit distance exactly 1 — SymSpell symmetric-delete
    blocking (complete for d=1: equal / deletion / shared-deletion
    covers sub+ins+del) + the batched prefix-min Levenshtein verify
    (functions/fuzzy.py).  3-shuffle shape: type fold → deletion-key
    hash-bucket exchange (groups = B buckets, never O(keys)) →
    pair-hash dedup + verify.  Oracle: DuckDB levenshtein() self-join
    over the same length/df-bounded vocabulary."""
    from ...functions.fuzzy import spelling_variant_pairs

    ds = _read(sf_dir, "part", ["p_name"])
    return spelling_variant_pairs(
        ds, text_col="p_name", min_len=3, max_len=14, df_min=1
    )


ORACLE_SPELLING = r"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(p_name), '\w+')) AS token
  FROM part
), v AS (
  SELECT token FROM tok GROUP BY token
  HAVING count(*) >= 1 AND length(token) BETWEEN 3 AND 14
)
SELECT a.token AS tok_a, b.token AS tok_b
FROM v a JOIN v b
  ON a.token < b.token AND levenshtein(a.token, b.token) = 1
"""


def q_bpe_vocab_documents(sf_dir: str) -> pa.Table:
    """Tokenizer training inside the engine: learn 40 BPE merges from
    the corpus (functions/bpe.py — one corpus pass folds the word-TYPE
    table, then every merge round is O(types) map-only pair counting +
    vectorized merge apply; the driver holds one (pair, count) row per
    round).  Iterative argmax over corpus-global counts is not
    SQL-expressible → rows-only gate; exact merge-sequence equality vs
    the textbook algorithm is pinned in tests/test_bpe.py."""
    from ...functions.bpe import bpe_learn

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bpe_learn(ds, 40)


def q_bpe_encode_documents(sf_dir: str):
    """Tokenizer APPLY: learn 40 BPE merges (same trainer as
    `bpe_vocab_documents`), then encode every document with the merge
    table and emit its real post-BPE sequence length — the statistic
    packing/mixing decisions need.  The merge table is tiny (one pair
    per rank) and binds once per actor via `BpeEncoder.__init__`
    (stateful actor-pool stage); each batch encodes its DISTINCT word
    types with the trainer's own vectorized merge kernel and gathers
    counts back per document.  Iterative BPE is not SQL-expressible →
    rows-only gate; encode-vs-reference equality is pinned in
    tests/test_bpe.py."""
    from ...functions.bpe import BpeEncoder, bpe_learn

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    merges_tbl = bpe_learn(ds, 40)
    merges = list(
        zip(
            merges_tbl.column("left").to_pylist(),
            merges_tbl.column("right").to_pylist(),
        )
    )
    return ds.map_batches(
        BpeEncoder,
        fn_constructor_args=(merges,),
        concurrency=(1, 8),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_event_transitions(sf_dir: str):
    """Markov next-event transition matrix (the user-journey /
    clickstream-path primitive): per user order events by (ts,
    event_id) and count every (prev_type → event_type) transition
    corpus-wide.  One keyed bucket exchange co-locates each user's
    rows (`keyed_window`), then per bucket ONE lexsort + a shifted
    compare produces the pairs and a batch-local value_counts folds
    them — the cross-bucket fold is over ≤|types|² tiny rows, so the
    driver never touches event-sized data.  Integer outputs → exact
    SQL parity (the oracle is the lag() window twin, same tiebreak)."""
    from ...functions.window import keyed_window

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        et = g.column("event_type")
        order = np.lexsort((eid, ts, uid))
        uid = uid[order]
        et = pc.take(et, pa.array(order, pa.int64())).combine_chunks()
        same_user = uid[1:] == uid[:-1]
        if not len(same_user) or not same_user.any():
            return pa.table(
                {
                    "prev_type": pa.array([], pa.string()),
                    "event_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        m = len(uid)
        mask = pa.array(same_user)
        prev = et.slice(0, m - 1).filter(mask)
        cur = et.slice(1, m - 1).filter(mask)
        return (
            pa.table({"prev_type": prev, "event_type": cur})
            .group_by(["prev_type", "event_type"])
            .aggregate([([], "count_all")])
            .rename_columns(["prev_type", "event_type", "n"])
        )

    return (
        keyed_window(ds, "user_id", fn)
        .groupby(["prev_type", "event_type"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["prev_type", "event_type", "n"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


ORACLE_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type
  FROM events
)
SELECT prev_type, event_type, count(*)::BIGINT AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


def q_token_diversity_documents(sf_dir: str):
    """Per-document lexical diversity via the Simpson/repeat-rate
    index (the text-degeneracy signal complementary to
    `repetition_stats_documents`' shingle ratio): for each doc emit
    n_tokens, n_distinct and sum_c2 = Σ c_i² over its unigram counts —
    repeat rate = sum_c2/n², type-token ratio = n_distinct/n, both
    derivable from the exact INTEGER outputs, so oracle parity never
    touches float summation order.  Zero shuffle: docs never span
    batches, so the whole statistic is one batch-local pass — tokenize
    (Arrow RE2), one lexsort over (doc, token-hash), run-length counts,
    three bincounts.  64-bit token hashes stand in for strings
    (collision odds ~0, the `dup_ngrams` convention)."""
    from ...functions.text import token_hash_stream

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        docs = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h, parents = token_hash_stream(t.column("text"))
        if not len(h):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "sum_c2": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((h, parents))
        hs, ps = h[order], parents[order]
        starts = np.flatnonzero(
            np.concatenate(([True], (ps[1:] != ps[:-1]) | (hs[1:] != hs[:-1])))
        )
        c = np.diff(np.append(starts, len(hs))).astype(np.int64)
        run_parent = ps[starts]
        n_rows = t.num_rows
        n_tok = np.bincount(parents, minlength=n_rows).astype(np.int64)
        n_dis = np.bincount(run_parent, minlength=n_rows).astype(np.int64)
        s_c2 = np.bincount(run_parent, weights=(c * c).astype(np.float64),
                           minlength=n_rows).astype(np.int64)
        keep = n_tok > 0  # zero-token docs absent, like the SQL side
        return pa.table(
            {
                "doc_id": pa.array(docs[keep], pa.int64()),
                "n_tokens": pa.array(n_tok[keep], pa.int64()),
                "n_distinct": pa.array(n_dis[keep], pa.int64()),
                "sum_c2": pa.array(s_c2[keep], pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_TOKEN_DIVERSITY = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS tok
  FROM documents
), c AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
)
SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*) AS n_distinct,
       sum(c * c)::BIGINT AS sum_c2
FROM c GROUP BY doc_id
"""


def q_pack_bpe_documents(sf_dir: str):
    """Sequence packing with REAL tokenizer lengths — the production
    form of `seq_pack_documents`: whitespace token counts misestimate
    post-BPE sequence lengths, so packing bins drift from the actual
    context budget.  Pipeline: learn the merge table (`bpe_learn`),
    encode every doc's true post-BPE length (`BpeEncoder` actor pool),
    then assign bin floor(bpe_tokens_before / budget) via the same
    distributed range-partitioned two-pass prefix scan
    (`ordered_prefix_sum`) — no driver loop, no global sort.  BPE is
    not SQL-expressible → rows-only gate; bin equivalence vs a
    reference single-process encode+pack is pinned in tests."""
    from ...functions.bpe import BpeEncoder, bpe_learn
    from ...functions.window import ordered_prefix_sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    merges_tbl = bpe_learn(ds, 40)
    merges = list(
        zip(
            merges_tbl.column("left").to_pylist(),
            merges_tbl.column("right").to_pylist(),
        )
    )
    counted = ds.map_batches(
        BpeEncoder,
        fn_constructor_args=(merges,),
        concurrency=(1, 8),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    scanned = ordered_prefix_sum(counted, "doc_id", "n_bpe_tokens")

    def binify(t: pa.Table) -> pa.Table:
        run = t.column("running").to_numpy(zero_copy_only=False)
        n = t.column("n_bpe_tokens").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_bpe_tokens": t.column("n_bpe_tokens"),
                "bin_id": pa.array((run - n) // _PACK_BUDGET, pa.int64()),
            }
        )

    return scanned.map_batches(
        binify, batch_format="pyarrow", zero_copy_batch=True
    )


def q_quality_classifier_documents(sf_dir: str) -> pa.Table:
    """Model-based quality filter trained INSIDE the engine (the
    fastText-classifier stage of GPT-3/PaLM-style pipelines): hashed
    256-dim token features (`hash_embed`, no vocab/model file),
    full-batch logistic regression by synchronous exact gradient
    aggregation (functions/classifier.py — driver holds 257 floats,
    per-iteration exchange is O(partials × d), independent of corpus
    size), then one streaming scoring pass.  Label here: lang='en'
    (a stand-in for any editorial quality label).  Model training →
    rows-only gate; reference-exactness, determinism and AUC are
    pinned in tests/test_classifier.py."""
    from ...functions.classifier import logreg_score, logreg_train
    from ...functions.similarity import hash_embed

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def featurize(t: pa.Table) -> pa.Table:
        t = hash_embed(t, dim=256)
        return t.drop_columns(["text"]).append_column(
            "label", pc.equal(t.column("lang"), "en")
        )

    feats = ds.map_batches(
        featurize, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # train loop re-reads features, not raw text
    w = logreg_train(feats, label_col="label", iters=30, lr=2.0)
    out = logreg_score(feats, w, keep_cols=("label",))
    return out.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id"),
                "is_en": t.column("label"),
                "score": t.column("score"),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_lm_bigram_documents(sf_dir: str):
    """Corpus bigram language-model quality score (the CCNet/KenLM
    filtering signal, Wenzek et al. 2020): train a Laplace-smoothed
    bigram LM on the corpus itself, then score every document by its
    per-bigram log-probabilities ln((c2+1)/(c1+V)) — c2 = corpus count
    of the bigram, c1 = corpus count of the prefix token, V = corpus
    vocabulary size.  Low-probability documents are boilerplate-free
    gibberish; high-probability ones are fluent (or duplicated) text.

    Per doc we emit ORDER-FREE float aggregates so oracle parity is
    bit-exact without caring about float summation order: min_lp (the
    most surprising bigram) and p50_lp (quantile_disc median, an exact
    element pick like `quantiles_value_per_user`).  Each lp itself is
    bit-equal to the SQL expression tree: integer counts -> one double
    divide -> one ln, matching `bm25_search`'s determinism argument.

    Fully distributed, 3 bounded-bucket shuffles, all over PRE-FOLDED
    rows: the batch pass explodes hashed bigram occurrences (64-bit
    token hashes stand in for strings, collision odds
    (#tokens)^2/2^64 ~= 0) and immediately folds batch-local
    (doc, bigram) duplicates into one row with multiplicity `m` — on
    repetitive corpora every later exchange moves a fraction of the
    token count.  Then: prefix-hash bucket attaches c1 by an
    m-weighted in-bucket reduceat (a bucket holds ALL occurrences of
    its prefix tokens, so the in-bucket sum IS the global count) ->
    bigram-hash bucket attaches c2 the same way and computes lp ->
    doc-hash bucket folds per-doc WEIGHTED order statistics (segment
    cumsum + searchsorted — never expanding multiplicities).  V is a
    distinct-count fold over a separate tiny per-batch-distinct token
    stream (vocab-bounded rows per batch), NOT a shuffle of the
    occurrence stream, and never a driver-side set.

    Perf ledger on the 1M-doc soak (32 CPUs): 262 s for v1 (3 shuffles
    of raw occurrences + sentinel vocab rows, materialized) -> 177 s
    for this shape (multiplicity fold + vocab side-stream).  A
    broadcast-c1 variant (partial-fold the vocab-sized unigram table,
    ray.put it, skip the w1 exchange) MEASURED SLOWER (340 s): its
    pre-pass re-tokenizes the corpus and sort-aggregates ~30M partial
    rows, costing more than the one bucketed exchange it saves — the
    exchange stays."""
    from ...functions.text import token_hash_stream

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    B1 = 64   # prefix-token hash buckets
    B2 = 64   # bigram hash buckets
    DB = 32   # doc buckets
    TB = 32   # vocab distinct buckets

    def tok_rows(t: pa.Table) -> pa.Table:
        # batch-local distinct token hashes: O(min(batch tokens, vocab))
        h, _ = token_hash_stream(t.column("text"))
        toks = np.unique((h >> np.uint64(1)).astype(np.int64))
        return pa.table(
            {
                "tok": pa.array(toks, pa.int64()),
                "__tb": pa.array(toks % TB, pa.int64()),
            }
        )

    def vocab_partial(g: pa.Table) -> pa.Table:
        toks = g.column("tok").to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([len(np.unique(toks))], pa.int64())})

    V = int(
        ds.map_batches(tok_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__tb")
        .map_groups(vocab_partial, batch_format="pyarrow")
        .sum("n")
    )

    def occ_rows(t: pa.Table) -> pa.Table:
        docs = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h, parents = token_hash_stream(t.column("text"))
        K = np.uint64(1099511628211)
        if len(h) >= 2:
            valid = parents[:-1] == parents[1:]
            h1 = h[:-1][valid]
            h2 = h[1:][valid]
            w1 = (h1 >> np.uint64(1)).astype(np.int64)
            bg = ((h1 * K + h2) >> np.uint64(1)).astype(np.int64)
            doc = docs[parents[:-1][valid]]
        else:
            w1 = bg = doc = np.zeros(0, np.int64)
        # batch-local (doc, bigram) multiplicity fold (docs never span
        # batches, so m is complete): one lexsort + run-length count
        if len(bg):
            order = np.lexsort((bg, doc))
            doc, w1, bg = doc[order], w1[order], bg[order]
            starts = np.flatnonzero(
                np.concatenate(
                    ([True], (doc[1:] != doc[:-1]) | (bg[1:] != bg[:-1]))
                )
            )
            m = np.diff(np.append(starts, len(bg)))
            doc, w1, bg = doc[starts], w1[starts], bg[starts]
        else:
            m = np.zeros(0, np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "w1": pa.array(w1, pa.int64()),
                "bg": pa.array(bg, pa.int64()),
                "m": pa.array(m.astype(np.int64), pa.int64()),
                "__b": pa.array(w1 % B1, pa.int64()),
            }
        )

    def _weighted_counts(keys: np.ndarray, m: np.ndarray) -> np.ndarray:
        """sum of m per distinct key, broadcast back to each row."""
        order = np.argsort(keys, kind="stable")
        ks, ms = keys[order], m[order]
        starts = np.flatnonzero(
            np.concatenate(([True], ks[1:] != ks[:-1]))
        )
        sums = np.add.reduceat(ms, starts)
        out = np.empty(len(keys), np.int64)
        out[order] = np.repeat(sums, np.diff(np.append(starts, len(ks))))
        return out

    def attach_c1(g: pa.Table) -> pa.Table:
        w1 = g.column("w1").to_numpy(zero_copy_only=False)
        m = g.column("m").to_numpy(zero_copy_only=False)
        c1 = (
            _weighted_counts(w1, m) if len(w1) else np.zeros(0, np.int64)
        )
        bg = g.column("bg").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "bg": g.column("bg"),
                "m": g.column("m"),
                "c1": pa.array(c1, pa.int64()),
                "__b2": pa.array(bg % B2, pa.int64()),
            }
        )

    def attach_c2(g: pa.Table) -> pa.Table:
        bg = g.column("bg").to_numpy(zero_copy_only=False)
        m = g.column("m").to_numpy(zero_copy_only=False)
        c1 = g.column("c1").to_numpy(zero_copy_only=False)
        c2 = (
            _weighted_counts(bg, m).astype(np.float64)
            if len(bg)
            else np.zeros(0, np.float64)
        )
        # expression tree mirrors the oracle: (c2 + 1.0) / (c1 + V)
        # with the denominator an exact integer sum, then one ln
        lp = np.log((c2 + 1.0) / (c1 + np.int64(V)).astype(np.float64))
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "lp": pa.array(lp, pa.float64()),
                "m": g.column("m"),
                "__db": pa.array(doc % DB, pa.int64()),
            }
        )

    def doc_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_bigrams": pa.array([], pa.int64()),
                    "min_lp": pa.array([], pa.float64()),
                    "p50_lp": pa.array([], pa.float64()),
                }
            )
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        lp = g.column("lp").to_numpy(zero_copy_only=False)
        m = g.column("m").to_numpy(zero_copy_only=False)
        order = np.lexsort((lp, doc))
        doc, lp, m = doc[order], lp[order], m[order]
        starts = np.flatnonzero(
            np.concatenate(([True], doc[1:] != doc[:-1]))
        ) if len(doc) else np.zeros(0, np.int64)
        cs = np.cumsum(m)  # strictly increasing (m >= 1)
        ends = np.append(starts[1:], len(doc)) - 1
        total = cs[ends] - np.where(starts > 0, cs[starts - 1], 0)
        base = np.where(starts > 0, cs[starts - 1], 0)
        # weighted quantile_disc(0.5): first row whose expanded-run
        # cumulative count reaches ceil(n/2) — searchsorted on the
        # global cumsum with absolute per-segment targets
        target = base + (total + 1) // 2
        p50 = lp[np.searchsorted(cs, target, side="left")]
        return pa.table(
            {
                "doc_id": pa.array(doc[starts], pa.int64()),
                "n_bigrams": pa.array(total.astype(np.int64), pa.int64()),
                "min_lp": pa.array(lp[starts], pa.float64()),
                "p50_lp": pa.array(p50, pa.float64()),
            }
        )

    return (
        ds.map_batches(occ_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(attach_c1, batch_format="pyarrow")
        .groupby("__b2")
        .map_groups(attach_c2, batch_format="pyarrow")
        .groupby("__db")
        .map_groups(doc_fold, batch_format="pyarrow")
    )


ORACLE_LM_BIGRAM = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w FROM documents
), occ AS (
  SELECT doc_id, bg[1] AS w1, bg[2] AS w2
  FROM (SELECT doc_id,
               unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS bg
        FROM toks WHERE len(w) >= 2)
), c1 AS (
  SELECT w1, count(*) AS c1 FROM occ GROUP BY w1
), c2 AS (
  SELECT w1, w2, count(*) AS c2 FROM occ GROUP BY w1, w2
), v AS (
  SELECT count(DISTINCT tok) AS vocab
  FROM (SELECT unnest(w) AS tok FROM toks)
), scored AS (
  SELECT o.doc_id, ln((c2.c2 + 1.0) / (c1.c1 + v.vocab)) AS lp
  FROM occ o
  JOIN c1 USING (w1)
  JOIN c2 ON o.w1 = c2.w1 AND o.w2 = c2.w2
  CROSS JOIN v
)
SELECT doc_id, count(*) AS n_bigrams, min(lp) AS min_lp,
       quantile_disc(lp, 0.5) AS p50_lp
FROM scored GROUP BY doc_id
"""


