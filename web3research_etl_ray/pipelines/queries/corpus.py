"""Corpus balance, mining, mixing and forensics waves.

Split from the monolithic queries.py (VERDICT r04 Next #7); the
source text of every operator is unchanged — only module boundaries
and explicit imports were added.  Registered in ``queries._registry``.
"""

from ._shared import (  # noqa: F401
    Sum,
    _cents,
    _from_rows,
    _read,
    _round_int,
    _tbl,
    hashlib,
    key_hash64,
    lang_id,
    np,
    pa,
    pc,
    pq,
    ray,
    sha256_hex,
    token_stats,
)
from .cdc import (  # noqa: F401
    _SESSION_GAP_US,
)
from .rowsonly import (  # noqa: F401
    ORACLE_LANG_ID,
)

# ---------------------------------------------------------------------------
# wave 12: tokenizer fertility per language, top user journeys,
#          hard-negative mining over embeddings
# ---------------------------------------------------------------------------


def q_fertility_per_lang(sf_dir: str) -> pa.Table:
    """Tokenizer fertility by language (chars per token) — the
    multilingual-budget diagnostic: a language whose tokens are
    'cheap' in characters eats more of a fixed token budget.  Same
    RE2 token kernel as token_stats, per-batch per-lang integer
    partials (≤ |langs| rows each), one tiny fold; only the final
    ratio is float."""
    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        stats = token_stats(t)
        return (
            pa.table(
                {
                    "lang": t.column("lang"),
                    "n_docs": pa.array(
                        np.ones(t.num_rows, dtype=np.int64)
                    ),
                    "n_tokens": stats.column("n_tokens"),
                    "n_chars": stats.column("n_chars_calc"),
                }
            )
            .group_by("lang")
            .aggregate(
                [("n_docs", "sum"), ("n_tokens", "sum"), ("n_chars", "sum")]
            )
            .rename_columns(["lang", "n_docs", "n_tokens", "n_chars"])
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_chars", alias_name="n_chars"),
        )
        .take_all()
    )
    t = _from_rows(
        rows,
        {"lang": pa.string(), "n_docs": pa.int64(),
         "n_tokens": pa.int64(), "n_chars": pa.int64()},
    ).sort_by("lang")
    ratio = pc.divide(
        t.column("n_chars").cast(pa.float64()),
        t.column("n_tokens").cast(pa.float64()),
    )
    return t.append_column("chars_per_token", ratio)


ORACLE_FERTILITY = r"""
SELECT lang, count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(text, '\w+'))) AS BIGINT)
         AS n_tokens,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       CAST(sum(length(text)) AS DOUBLE)
         / CAST(sum(len(regexp_extract_all(text, '\w+'))) AS BIGINT)
         AS chars_per_token
FROM documents GROUP BY lang ORDER BY lang
"""


def q_top_journeys(sf_dir: str) -> pa.Table:
    """Top-10 session-opening journeys: the first ≤3 event types of
    each 30-min-gap session, '>'-joined — the funnel-discovery
    operator.  Session assignment is the session_windows kernel (one
    lexsort + gap diff per user bucket); the 3 opening types gather by
    start-offset arithmetic and join via one vectorized
    binary_join_element_wise; journey counts fold partially per batch
    before one tiny groupby and a deterministic (count desc, journey
    asc) top-10."""
    from ...functions.window import keyed_window

    K = 10
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def bucketize(t: pa.Table) -> pa.Table:
        uids = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(uids % 16, pa.int64()))

    def journeys(g: pa.Table) -> pa.Table:
        uids = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uids))
        uids, ts = uids[order], ts[order]
        typ = g.column("event_type").take(pa.array(order))
        n = len(uids)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uids[1:] != uids[:-1]
        gap = np.ones(n, dtype=bool)
        gap[1:] = (ts[1:] - ts[:-1]) > _SESSION_GAP_US
        starts = np.flatnonzero(new_user | gap)
        counts = np.diff(np.concatenate((starts, [n])))
        parts = []
        for k in range(3):
            idx = np.where(counts > k, starts + k, starts)  # safe gather
            col = typ.take(pa.array(idx))
            # mask out sessions shorter than k+1 with ""
            col = pc.if_else(
                pa.array(counts > k), col, pa.scalar("", pa.string())
            )
            if k > 0:
                col = pc.if_else(
                    pa.array(counts > k),
                    pc.binary_join_element_wise(
                        pa.array([">"] * len(starts), pa.string()), col, ""
                    ),
                    pa.scalar("", pa.string()),
                )
            parts.append(col)
        journey = pc.binary_join_element_wise(*parts, "")
        return (
            pa.table({"journey": journey})
            .group_by("journey")
            .aggregate([("journey", "count")])
            .rename_columns(["journey", "n_sessions"])
        )

    partials = (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(
            lambda g: journeys(g.drop_columns(["__b"])),
            batch_format="pyarrow",
        )
    )

    def topk(t: pa.Table) -> pa.Table:
        return t.sort_by(
            [("n_sessions", "descending"), ("journey", "ascending")]
        ).slice(0, K)

    rows = (
        partials.groupby("journey")
        .aggregate(Sum("n_sessions", alias_name="n_sessions"))
        .map_batches(topk, batch_format="pyarrow")
        .take_all()
    )
    return _from_rows(
        rows, {"journey": pa.string(), "n_sessions": pa.int64()}
    ).sort_by(
        [("n_sessions", "descending"), ("journey", "ascending")]
    ).slice(0, K)


ORACLE_TOP_JOURNEYS = """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(is_start) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn
  FROM s
),
j AS (
  SELECT user_id, sid,
         string_agg(event_type, '>' ORDER BY rn) AS journey
  FROM r WHERE rn <= 3 GROUP BY user_id, sid
)
SELECT journey, count(*) AS n_sessions
FROM j GROUP BY journey
ORDER BY n_sessions DESC, journey LIMIT 10
"""


def q_hard_negatives_embeddings(sf_dir: str) -> pa.Table:
    """Hard-negative mining: for every vector, the most-similar vector
    with a DIFFERENT label — the contrastive-training pair generator.
    Same block-pair exchange as cosine_neardup_pairs (no full-matrix
    broadcast); each (g1,g2) group emits one partial best per vector
    side (cross-label mask on the sims matrix, exact-tie broken to the
    smallest neg id), and a keyed fold takes the global (max sim, min
    id) — O(vecs) rows, never O(vecs²), past the exchange.  Float64
    cosine on both sides; output is ids only so the hash compare is
    ulp-robust (sims differ from DuckDB's sequential sum only in the
    last ulp, and top-1 margins on this data are >> that)."""
    from ...functions.similarity import _batch_mat, _normalize
    from ...functions.window import keyed_window, segment_starts

    B = 4
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def route(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        g = (ids % B).astype(np.int64)
        out = []
        for g1 in range(B):
            for g2 in range(g1, B):
                sel = (g == g1) | (g == g2)
                if not sel.any():
                    continue
                sub = batch.filter(pa.array(sel))
                out.append(
                    sub.append_column(
                        "__grp",
                        pa.array(np.full(sub.num_rows, g1 * B + g2),
                                 pa.int64()),
                    )
                )
        return pa.concat_tables(out)

    def best_cross(ids_a, mat_a, lab_a, ids_b, mat_b, lab_b):
        sims = mat_a @ mat_b.T
        mask = lab_a[:, None] == lab_b[None, :]
        sims[mask] = -np.inf
        best = sims.max(axis=1)
        tie = sims == best[:, None]
        neg = np.where(tie, ids_b[None, :], np.iinfo(np.int64).max).min(
            axis=1
        )
        ok = np.isfinite(best)
        return pa.table(
            {
                "vec_id": pa.array(ids_a[ok], pa.int64()),
                "sim": pa.array(best[ok], pa.float64()),
                "neg_id": pa.array(neg[ok], pa.int64()),
            }
        )

    def pairs_in_group(group: pa.Table) -> pa.Table:
        grp = int(group.column("__grp")[0].as_py())
        g1, g2 = divmod(grp, B)
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        lab = group.column("label").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        mat = _normalize(_batch_mat(group, "embedding"))
        blk = (ids % B).astype(np.int64)
        if g1 == g2:
            sel = blk == g1
            return best_cross(
                ids[sel], mat[sel], lab[sel], ids[sel], mat[sel], lab[sel]
            )
        sa, sb = blk == g1, blk == g2
        return pa.concat_tables(
            [
                best_cross(ids[sa], mat[sa], lab[sa],
                           ids[sb], mat[sb], lab[sb]),
                best_cross(ids[sb], mat[sb], lab[sb],
                           ids[sa], mat[sa], lab[sa]),
            ]
        )

    partials = (
        ds.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__grp")
        .map_groups(pairs_in_group, batch_format="pyarrow")
    )

    def fold(g: pa.Table) -> pa.Table:
        vid = g.column("vec_id").to_numpy(zero_copy_only=False)
        sim = g.column("sim").to_numpy(zero_copy_only=False)
        neg = g.column("neg_id").to_numpy(zero_copy_only=False)
        # per vec: max sim, exact ties to min neg_id
        order = np.lexsort((neg, -sim, vid))
        vid, neg = vid[order], neg[order]
        starts = np.flatnonzero(segment_starts(vid))
        return pa.table(
            {
                "vec_id": pa.array(vid[starts], pa.int64()),
                "neg_id": pa.array(neg[starts], pa.int64()),
            }
        )

    return keyed_window(partials, "vec_id", fold).sort("vec_id")


ORACLE_HARD_NEGATIVES = """
WITH p AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neg_id,
         list_cosine_similarity(a.embedding, b.embedding) AS sim
  FROM embeddings a JOIN embeddings b ON a.label <> b.label
),
r AS (
  SELECT vec_id, neg_id,
         row_number() OVER (
             PARTITION BY vec_id ORDER BY sim DESC, neg_id) AS rn
  FROM p
)
SELECT vec_id, neg_id FROM r WHERE rn = 1 ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# wave 13: temperature-sampled source mixing, perceptual-hash media
#          dedup, repeat-purchase rate
# ---------------------------------------------------------------------------


def q_temperature_mix_documents(sf_dir: str) -> pa.Table:
    """Temperature-sampled source mixing (τ = 0.5): each source's
    share of a 10% corpus budget is ∝ √count — the multilingual /
    multi-source rebalancing primitive (big sources are down-weighted,
    small ones up-weighted).  All quota arithmetic is INTEGER (isqrt
    weights, floor division — the oracle spells the same isqrt out as
    a floor(sqrt)±1 CASE), so there is no float boundary; selection
    within a source is content-hash rank.  Per-batch partial top-k_s
    per source bounds the exchange at O(Σ k_s) rows, then one
    source-keyed fold picks the exact global k_s."""
    import math

    from ...functions.window import keyed_window, row_numbers, segment_starts

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def count_partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"source": t.column("source")})
            .group_by("source")
            .aggregate([("source", "count")])
            .rename_columns(["source", "n"])
        )

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    src_n = {r["source"]: int(r["n"]) for r in counts}
    weights = {s: math.isqrt(n) for s, n in src_n.items()}
    total = sum(src_n.values())
    target = total // 10
    sw = sum(weights.values())
    quota = {s: (target * w) // sw for s, w in weights.items()}

    def select_partial(t: pa.Table) -> pa.Table:
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        sha = np.asarray(
            sha256_hex(t.column("doc_id").cast(pa.string())).to_pylist()
        )
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, sha, src))
        src, sha_s, did_s = src[order], sha[order], did[order]
        starts = segment_starts(src)
        rn = row_numbers(starts)
        u, inv = np.unique(src, return_inverse=True)
        kcap = np.asarray([quota[s] for s in u], dtype=np.int64)[inv]
        keep = rn <= kcap
        return pa.table(
            {
                "doc_id": pa.array(did_s[keep], pa.int64()),
                "source": pa.array(src[keep], pa.string()),
                "sha": pa.array(sha_s[keep], pa.string()),
            }
        )

    partials = ds.map_batches(
        select_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        src = np.asarray(g.column("source").to_pylist(), dtype=object)
        sha = np.asarray(g.column("sha").to_pylist())
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, sha, src))
        src, did = src[order], did[order]
        starts = segment_starts(src)
        rn = row_numbers(starts)
        u, inv = np.unique(src, return_inverse=True)
        kcap = np.asarray([quota[s] for s in u], dtype=np.int64)[inv]
        keep = rn <= kcap
        return pa.table(
            {
                "doc_id": pa.array(did[keep], pa.int64()),
                "source": pa.array(src[keep], pa.string()),
            }
        )

    return keyed_window(partials, "source", fold).sort("doc_id")


ORACLE_TEMPERATURE_MIX = """
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
w0 AS (
  SELECT source, n,
         CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS r0
  FROM c
),
w AS (  -- exact integer sqrt: fix any float rounding of floor(sqrt)
  SELECT source, n,
         CASE WHEN (r0 + 1) * (r0 + 1) <= n THEN r0 + 1
              WHEN r0 * r0 > n THEN r0 - 1
              ELSE r0 END AS wt
  FROM w0
),
t AS (
  SELECT CAST(sum(n) AS BIGINT) // 10 AS target,
         CAST(sum(wt) AS BIGINT) AS sw
  FROM w
),
k AS (SELECT source, (SELECT target FROM t) * wt // (SELECT sw FROM t)
        AS quota FROM w),
r AS (
  SELECT doc_id, source,
         row_number() OVER (
             PARTITION BY source
             ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT r.doc_id, r.source
FROM r JOIN k ON r.source = k.source
WHERE r.rn <= k.quota ORDER BY r.doc_id
"""


def q_phash_media_dupes(sf_dir: str) -> pa.Table:
    """Duplicate-media clusters by perceptual hash: documents rendered
    as real BMP payloads, decoded and average-hashed (8×8 gray) in an
    actor-pool stage, then grouped by the 64-bit hash — duplicate
    texts render identical bitmaps, so the planted duplicate docs
    surface as media clusters.  Per-batch partial (hash → count,
    min id) keeps the exchange O(distinct hashes).  Rows-only (SQL
    cannot decode BMPs); the hash kernel itself is unit-tested with
    planted identical/near/distinct images."""
    from ...functions.multimodal import media_phash_pipeline
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    hashes = media_phash_pipeline(ds)

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.group_by("ahash")
            .aggregate([("media_id", "count"), ("media_id", "min")])
            .rename_columns(["ahash", "n_media", "min_media_id"])
        )

    partials = hashes.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        h = g.column("ahash").to_numpy(zero_copy_only=False)
        n = g.column("n_media").to_numpy(zero_copy_only=False)
        mn = g.column("min_media_id").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h, n, mn = h[order], n[order], mn[order]
        starts = np.flatnonzero(segment_starts(h))
        tot = np.add.reduceat(n, starts)
        mins = np.minimum.reduceat(mn, starts)
        keep = tot >= 2
        return pa.table(
            {
                "ahash": pa.array(h[starts][keep], pa.int64()),
                "n_media": pa.array(tot[keep], pa.int64()),
                "min_media_id": pa.array(mins[keep], pa.int64()),
            }
        )

    return keyed_window(partials, "ahash", fold).sort("min_media_id")


def q_repeat_purchase_rate(sf_dir: str) -> pa.Table:
    """Repeat-purchase rate: of users with ≥1 purchase event, the
    fraction with ≥2 — the retention KPI.  Per-user purchase counts
    fold exactly; only two scalars reach the driver."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        return (
            pa.table({"user_id": t.column("user_id")})
            .group_by("user_id")
            .aggregate([("user_id", "count")])
            .rename_columns(["user_id", "n"])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid, n = uid[order], n[order]
        starts = np.flatnonzero(segment_starts(uid))
        tot = np.add.reduceat(n, starts)
        return pa.table(
            {
                "buyers": pa.array([len(tot)], pa.int64()),
                "repeaters": pa.array(
                    [int((tot >= 2).sum())], pa.int64()
                ),
            }
        )

    agg = keyed_window(partials, "user_id", fold).aggregate(
        Sum("buyers", alias_name="buyers"),
        Sum("repeaters", alias_name="repeaters"),
    )
    b, r = int(agg["buyers"] or 0), int(agg["repeaters"] or 0)
    rate = np.float64(r) / np.float64(b) if b else float("nan")
    return pa.table(
        {
            "buyers": pa.array([b], pa.int64()),
            "repeaters": pa.array([r], pa.int64()),
            "repeat_rate": pa.array([float(rate)], pa.float64()),
        }
    )


ORACLE_REPEAT_PURCHASE = """
WITH c AS (
  SELECT user_id, count(*) AS n FROM events
  WHERE event_type = 'purchase' GROUP BY 1
)
SELECT count(*) AS buyers,
       CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS repeaters,
       CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS repeat_rate
FROM c
"""


# ---------------------------------------------------------------------------
# wave 14: the last TPC-H shapes this schema can express
#          (Q7 volume shipping, Q17 small-quantity revenue, Q19
#          disjunctive predicate scan); Q2/Q9/Q11/Q16/Q20 need
#          partsupp and Q12/Q21 need commit/receipt dates — neither
#          exists in the fixture schema (documented, not skipped
#          silently).
# ---------------------------------------------------------------------------


def q_tpch_q7(sf_dir: str) -> pa.Table:
    """TPC-H Q7-shaped volume shipping: revenue flowing between two
    nations (supplier side vs ordering-customer side, both
    directions), per ship year.  supplier and customer nation maps
    broadcast; one orderkey exchange; per-batch partials collapse to
    ≤ 2 × years rows."""
    from ...functions.joins import broadcast_join, hash_join

    NA, NB = "NATION_12", "NATION_3"

    nation = pq.read_table(
        _tbl(sf_dir, "nation"), columns=["n_nationkey", "n_name"]
    )
    tgt = nation.filter(
        pc.is_in(nation.column("n_name"),
                 value_set=pa.array([NA, NB], pa.string()))
    )
    supp = pq.read_table(
        _tbl(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    ).join(
        tgt.rename_columns(["s_nationkey", "supp_nation"]),
        keys=["s_nationkey"], join_type="inner",
    ).select(["s_suppkey", "supp_nation"]).rename_columns(
        ["l_suppkey", "supp_nation"]
    )
    cust = pq.read_table(
        _tbl(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    ).join(
        tgt.rename_columns(["c_nationkey", "cust_nation"]),
        keys=["c_nationkey"], join_type="inner",
    ).select(["c_custkey", "cust_nation"]).rename_columns(
        ["o_custkey", "cust_nation"]
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    forders = broadcast_join(orders, cust, "o_custkey").map_batches(
        lambda t: t.select(["o_orderkey", "cust_nation"]).rename_columns(
            ["l_orderkey", "cust_nation"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    lineitem = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
         "l_discount"],
    )
    lsupp = broadcast_join(lineitem, supp, "l_suppkey")
    joined = hash_join(
        lsupp, forders, "l_orderkey",
        left_cols=["l_shipdate", "l_extendedprice", "l_discount",
                   "supp_nation"],
        right_cols=["cust_nation"],
    )

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.invert(
            pc.equal(t.column("supp_nation"), t.column("cust_nation"))
        )
        t = t.filter(keep)
        rev = _cents(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
        )
        return (
            pa.table(
                {
                    "supp_nation": t.column("supp_nation"),
                    "cust_nation": t.column("cust_nation"),
                    "yr": pc.year(t.column("l_shipdate")).cast(pa.int64()),
                    "revenue_cents": rev,
                }
            )
            .group_by(["supp_nation", "cust_nation", "yr"])
            .aggregate([("revenue_cents", "sum")])
            .rename_columns(
                ["supp_nation", "cust_nation", "yr", "revenue_cents"]
            )
        )

    rows = (
        joined.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby(["supp_nation", "cust_nation", "yr"])
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .take_all()
    )
    return _from_rows(
        rows,
        {"supp_nation": pa.string(), "cust_nation": pa.string(),
         "yr": pa.int64(), "revenue_cents": pa.int64()},
    ).sort_by(
        [("supp_nation", "ascending"), ("cust_nation", "ascending"),
         ("yr", "ascending")]
    )


ORACLE_TPCH_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS yr,
       CAST(sum(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_3')
   OR (n1.n_name = 'NATION_3'  AND n2.n_name = 'NATION_12')
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q_tpch_q17(sf_dir: str) -> pa.Table:
    """TPC-H Q17-shaped small-quantity revenue: lineitems of one
    brand's parts whose quantity is below 20% of that part's average
    quantity.  The average gate is the integer cross-multiply
    qi·5·n < Σq (no float threshold); the brand's partkeys broadcast
    as a semi-filter FIRST so the per-part aggregate runs over the
    brand slice only, then one partkey exchange joins each lineitem
    back to its part's (Σq, n)."""
    from ...functions.joins import broadcast_join, hash_join
    from ...functions.window import keyed_window, segment_starts

    BRAND = "Brand#1"
    part = pq.read_table(
        _tbl(sf_dir, "part"), columns=["p_partkey", "p_brand"]
    )
    bkeys = part.filter(
        pc.equal(part.column("p_brand"), BRAND)
    ).select(["p_partkey"]).rename_columns(["l_partkey"])

    lineitem = _read(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
    )
    li = broadcast_join(lineitem, bkeys, "l_partkey", how="semi")

    def enrich(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "qi": _round_int(t.column("l_quantity")),
                "pc_": _cents(t.column("l_extendedprice")),
            }
        )

    rows_ds = li.map_batches(
        enrich, batch_format="pyarrow", zero_copy_batch=True
    )

    def agg_partial(t: pa.Table) -> pa.Table:
        return (
            t.select(["l_partkey", "qi"])
            .group_by("l_partkey")
            .aggregate([("qi", "sum"), ("qi", "count")])
            .rename_columns(["l_partkey", "sq", "n"])
        )

    agg = (
        rows_ds.map_batches(agg_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("sq", alias_name="sq"), Sum("n", alias_name="n"))
    )
    joined = hash_join(
        rows_ds, agg, "l_partkey",
        left_cols=["qi", "pc_"],
        right_cols=["sq", "n"],
    )

    def gate(t: pa.Table) -> pa.Table:
        qi = t.column("qi").to_numpy(zero_copy_only=False)
        sq = t.column("sq").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        pcents = t.column("pc_").to_numpy(zero_copy_only=False)
        keep = qi * 5 * n < sq
        return pa.table(
            {
                "n_lineitems": pa.array([int(keep.sum())], pa.int64()),
                "revenue_cents": pa.array(
                    [int(pcents[keep].sum())], pa.int64()
                ),
            }
        )

    out = joined.map_batches(
        gate, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(
        Sum("n_lineitems", alias_name="n_lineitems"),
        Sum("revenue_cents", alias_name="revenue_cents"),
    )
    n, cents = int(out["n_lineitems"] or 0), int(out["revenue_cents"] or 0)
    return pa.table(
        {
            "n_lineitems": pa.array([n], pa.int64()),
            "revenue_cents": pa.array([cents], pa.int64()),
            "avg_yearly_cents": pa.array(
                [np.float64(cents) / 7.0], pa.float64()
            ),
        }
    )


ORACLE_TPCH_Q17 = """
WITH q AS (
  SELECT l_partkey, CAST(ROUND(l_quantity) AS BIGINT) AS qi,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS pc
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1')
),
a AS (
  SELECT l_partkey, CAST(sum(qi) AS BIGINT) AS sq, count(*) AS n
  FROM q GROUP BY 1
)
SELECT count(*) AS n_lineitems,
       CAST(coalesce(sum(q.pc), 0) AS BIGINT) AS revenue_cents,
       CAST(coalesce(sum(q.pc), 0) AS DOUBLE) / 7.0 AS avg_yearly_cents
FROM q JOIN a USING (l_partkey)
WHERE q.qi * 5 * a.n < a.sq
"""


def q_tpch_q19(sf_dir: str) -> pa.Table:
    """TPC-H Q19-shaped disjunctive predicate scan: revenue from
    lineitems matching any of three (brand, size range, quantity
    range) conjunctions — the multi-clause pushdown test.  part's
    (brand, size) broadcast once; the OR evaluates vectorized per
    batch; two scalars reach the driver."""
    from ...functions.joins import broadcast_join

    part = pq.read_table(
        _tbl(sf_dir, "part"), columns=["p_partkey", "p_brand", "p_size"]
    ).rename_columns(["l_partkey", "p_brand", "p_size"])
    lineitem = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    joined = broadcast_join(lineitem, part, "l_partkey")

    CLAUSES = [
        ("Brand#1", 1, 15, 1, 20),
        ("Brand#2", 10, 30, 10, 30),
        ("Brand#3", 20, 50, 20, 40),
    ]

    def partial(t: pa.Table) -> pa.Table:
        brand = t.column("p_brand")
        size = t.column("p_size").cast(pa.int64())
        qty = t.column("l_quantity")
        keep = None
        for b, s_lo, s_hi, q_lo, q_hi in CLAUSES:
            c = pc.and_(
                pc.and_(
                    pc.equal(brand, b),
                    pc.and_(
                        pc.greater_equal(size, s_lo),
                        pc.less_equal(size, s_hi),
                    ),
                ),
                pc.and_(
                    pc.greater_equal(qty, float(q_lo)),
                    pc.less_equal(qty, float(q_hi)),
                ),
            )
            keep = c if keep is None else pc.or_(keep, c)
        t = t.filter(keep)
        rev = _cents(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_lineitems": pa.array([t.num_rows], pa.int64()),
                "revenue_cents": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    out = joined.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(
        Sum("n_lineitems", alias_name="n_lineitems"),
        Sum("revenue_cents", alias_name="revenue_cents"),
    )
    return pa.table(
        {
            "n_lineitems": pa.array(
                [int(out["n_lineitems"] or 0)], pa.int64()
            ),
            "revenue_cents": pa.array(
                [int(out["revenue_cents"] or 0)], pa.int64()
            ),
        }
    )


ORACLE_TPCH_Q19 = """
SELECT count(*) AS n_lineitems,
       CAST(coalesce(sum(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                    * 100) AS BIGINT)), 0) AS BIGINT)
         AS revenue_cents
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 40)
"""



# ---------------------------------------------------------------------------
# wave 16: code-corpus preprocessing + corpus statistics
# ---------------------------------------------------------------------------


def q_fim_split_documents(sf_dir: str) -> ray.data.Dataset:
    """Fill-in-the-middle (FIM) transform — the code-LLM preprocessing
    step (north rule: source-code corpora): split each doc at two
    deterministic offsets into prefix/middle/suffix and emit the PSM
    reordering '<PRE>'+prefix+'<SUF>'+suffix+'<MID>'+middle as a
    sha256 (the payload itself stays in the lake; the sha proves the
    transform byte-for-byte).  Offsets are hash-of-id arithmetic so
    the oracle can mirror them exactly: a = (id*48271+11) % (n+1),
    b = a + (id*16807+7) % (n-a+1).

    Vectorization note: offset arithmetic is numpy over the whole
    batch; the per-row loop exists only for sha256 (hashlib has no
    batch API — the same inherent loop as ``sha256_hex``), and slices
    feed ``hashlib.update`` directly, no concat copies."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def split(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = pc.utf8_length(
            pc.fill_null(t.column("text"), "")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        a = (did * 48271 + 11) % (n + 1)
        b = a + (did * 16807 + 7) % (n - a + 1)
        texts = t.column("text").to_pylist()
        shas = [
            hashlib.sha256(
                b"<PRE>" + s[:ai].encode() + b"<SUF>" + s[bi:].encode()
                + b"<MID>" + s[ai:bi].encode()
            ).hexdigest()
            for s, ai, bi in zip(texts, a.tolist(), b.tolist())
        ]
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "p_len": pa.array(a, pa.int64()),
                "m_len": pa.array(b - a, pa.int64()),
                "s_len": pa.array(n - b, pa.int64()),
                "fim_sha256": pa.array(shas, pa.string()),
            }
        )

    return ds.map_batches(
        split, batch_format="pyarrow", zero_copy_batch=True
    ).sort("doc_id")


ORACLE_FIM_SPLIT = """
WITH s AS (
  SELECT doc_id, text, length(text) AS n,
         (doc_id * 48271 + 11) % (length(text) + 1) AS a
  FROM documents
), s2 AS (
  SELECT doc_id, text, n, a,
         a + ((doc_id * 16807 + 7) % (n - a + 1)) AS b
  FROM s
)
SELECT doc_id,
       CAST(a AS BIGINT) AS p_len,
       CAST(b - a AS BIGINT) AS m_len,
       CAST(n - b AS BIGINT) AS s_len,
       sha256('<PRE>' || substr(text, 1, CAST(a AS INT)) || '<SUF>' ||
              substr(text, CAST(b + 1 AS INT)) || '<MID>' ||
              substr(text, CAST(a + 1 AS INT), CAST(b - a AS INT)))
         AS fim_sha256
FROM s2 ORDER BY doc_id
"""


def q_vocab_richness_per_source(sf_dir: str) -> ray.data.Dataset:
    """Vocabulary richness per source: total token count and DISTINCT
    token count (types) — the type/token ratio inputs that flag
    template-generated or looping feeds.  Distributed COUNT(DISTINCT)
    per group: per-batch (token, source, cnt) partials → token-keyed
    bucket exchange (a token's rows land in ONE bucket, so per-bucket
    distinct counts are additive) → per-source sums."""
    from ...functions.window import keyed_window

    ds = _read(sf_dir, "documents", ["text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")),
            pattern=r"\W+",
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ok = pc.greater(pc.utf8_length(flat), 0)
        flat = flat.filter(ok)
        src = pc.take(t.column("source"), parent.filter(ok))
        return (
            pa.table({"tok": flat, "source": src})
            .group_by(["tok", "source"])
            .aggregate([("tok", "count")])
            .rename_columns(["tok", "source", "cnt"])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        g = (
            g.group_by(["tok", "source"])
            .aggregate([("cnt", "sum")])
            .rename_columns(["tok", "source", "cnt"])
        )
        # one row per (token, source) now: types = row count per source
        return (
            pa.table(
                {
                    "source": g.column("source"),
                    "n_tokens": g.column("cnt").cast(pa.int64()),
                    "n_types": pa.array(
                        np.ones(g.num_rows, np.int64), pa.int64()
                    ),
                }
            )
            .group_by("source")
            .aggregate([("n_tokens", "sum"), ("n_types", "sum")])
            .rename_columns(["source", "n_tokens", "n_types"])
        )

    bucketed = keyed_window(partials, "tok", per_bucket)

    def fold(g: pa.Table) -> pa.Table:
        return (
            g.group_by("source")
            .aggregate([("n_tokens", "sum"), ("n_types", "sum")])
            .rename_columns(["source", "n_tokens", "n_types"])
        )

    return keyed_window(bucketed, "source", fold).sort("source")


ORACLE_VOCAB_RICHNESS = r"""
WITH toks AS (
  SELECT source,
         unnest(list_filter(regexp_extract_all(lower(text), '\w+'),
                            x -> length(x) > 0)) AS tok
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT tok) AS BIGINT) AS n_types
FROM toks GROUP BY 1 ORDER BY source
"""


_PMI_MIN_COUNT = 5
_PMI_TOP_K = 20


def q_pmi_collocations(sf_dir: str) -> pa.Table:
    """Top-20 collocations by pointwise mutual information over word
    bigrams: PMI = ln(c_ab·N / (c_a·c_b)), candidates capped at
    c_ab ≥ 5 — the corpus-statistics primitive behind phrase mining
    and tokenizer-merge seeding.

    Distributed: bigram partial counts → bigram-keyed fold; unigram
    partial counts → token-keyed fold; unigram counts attach to each
    bigram side through the generic pair↔value exchange
    (``attach_pair_values`` — values move ONCE, no driver dict);
    N is the one scalar on the driver.  Final top-k: per-block
    partial top-20 → driver merges ≤ 20·blocks rows.  Selection is
    deterministic: (pmi, w1, w2) with integer counts underneath."""
    from ...functions.exchange import attach_pair_values
    from ...functions.hashing import key_hash64
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "documents", ["text"])

    def _flat_tokens(t: pa.Table):
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")),
            pattern=r"\W+",
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ok = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        return flat.filter(pa.array(ok)), parent[ok]

    def uni_partial(t: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(t)
        return (
            pa.table({"tok": flat})
            .group_by("tok")
            .aggregate([("tok", "count")])
            .rename_columns(["tok", "c"])
        )

    def uni_fold(g: pa.Table) -> pa.Table:
        return (
            g.group_by("tok")
            .aggregate([("c", "sum")])
            .rename_columns(["tok", "c"])
        )

    unigrams = keyed_window(
        ds.map_batches(
            uni_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "tok",
        uni_fold,
    )
    n_tokens = int(unigrams.aggregate(Sum("c", alias_name="c"))["c"] or 0)

    def big_partial(t: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(t)
        n = len(flat)
        if n < 2:
            return pa.table(
                {"w1": pa.array([], pa.string()),
                 "w2": pa.array([], pa.string()),
                 "c_ab": pa.array([], pa.int64()),
                 "__k": pa.array([], pa.string())}
            )
        w1 = flat.slice(0, n - 1)
        w2 = flat.slice(1, n - 1)
        valid = parent[: n - 1] == parent[1:]
        g = (
            pa.table({"w1": w1, "w2": w2})
            .filter(pa.array(valid))
            .group_by(["w1", "w2"])
            .aggregate([("w1", "count")])
            .rename_columns(["w1", "w2", "c_ab"])
        )
        return g.append_column(
            "__k",
            pc.binary_join_element_wise(g.column("w1"), g.column("w2"), " "),
        )

    def big_fold(g: pa.Table) -> pa.Table:
        g = (
            g.group_by(["w1", "w2"])
            .aggregate([("c_ab", "sum")])
            .rename_columns(["w1", "w2", "c_ab"])
        )
        return g.filter(
            pc.greater_equal(g.column("c_ab"), _PMI_MIN_COUNT)
        )

    bigrams = keyed_window(
        ds.map_batches(
            big_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "__k",
        big_fold,
    )

    def to_pairs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": pa.array(
                    key_hash64(t.column("w1")).astype(np.int64), pa.int64()
                ),
                "id_b": pa.array(
                    key_hash64(t.column("w2")).astype(np.int64), pa.int64()
                ),
                "w1": t.column("w1"),
                "w2": t.column("w2"),
                "c_ab": t.column("c_ab").cast(pa.int64()),
            }
        )

    def to_values(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(
                    key_hash64(t.column("tok")).astype(np.int64), pa.int64()
                ),
                "c": t.column("c").cast(pa.int64()),
            }
        )

    pairs = bigrams.map_batches(
        to_pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    values = unigrams.map_batches(
        to_values, batch_format="pyarrow", zero_copy_batch=True
    )
    attached = attach_pair_values(
        pairs,
        values,
        value_col="c",
        value_type=pa.int64(),
        carry_cols=("w1", "w2", "c_ab"),
        carry_types={"w1": pa.string(), "w2": pa.string(),
                     "c_ab": pa.int64()},
    )

    def topk_partial(t: pa.Table) -> pa.Table:
        c_ab = t.column("c_ab").to_numpy(zero_copy_only=False)
        c_a = t.column("value_a").to_numpy(zero_copy_only=False)
        c_b = t.column("value_b").to_numpy(zero_copy_only=False)
        # operation order mirrors the oracle exactly:
        # (double(c_ab) * N) / (double(c_a) * double(c_b))
        pmi = np.log(
            (c_ab.astype(np.float64) * np.float64(n_tokens))
            / (c_a.astype(np.float64) * c_b.astype(np.float64))
        )
        t = pa.table(
            {
                "w1": t.column("w1"),
                "w2": t.column("w2"),
                "c_ab": pa.array(c_ab.astype(np.int64), pa.int64()),
                "c_a": pa.array(c_a.astype(np.int64), pa.int64()),
                "c_b": pa.array(c_b.astype(np.int64), pa.int64()),
                "pmi": pa.array(pmi, pa.float64()),
            }
        )
        return t.sort_by(
            [("pmi", "descending"), ("w1", "ascending"),
             ("w2", "ascending")]
        ).slice(0, _PMI_TOP_K)

    tops = attached.map_batches(
        topk_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    tiny = _from_rows(
        tops.take_all(),
        {"w1": pa.string(), "w2": pa.string(), "c_ab": pa.int64(),
         "c_a": pa.int64(), "c_b": pa.int64(), "pmi": pa.float64()},
    )
    return tiny.sort_by(
        [("pmi", "descending"), ("w1", "ascending"), ("w2", "ascending")]
    ).slice(0, _PMI_TOP_K)


ORACLE_PMI = r"""
WITH toks AS (
  SELECT doc_id, i AS pos, ts[CAST(i AS INT)] AS w
  FROM (SELECT doc_id,
               list_filter(regexp_extract_all(lower(text), '\w+'),
                           x -> length(x) > 0) AS ts
        FROM documents)
  JOIN range(1, 4096) t(i) ON t.i <= len(ts)
), big AS (
  SELECT a.w AS w1, b.w AS w2, count(*) AS c_ab
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2 HAVING count(*) >= 5
), uni AS (
  SELECT w, count(*) AS c FROM toks GROUP BY 1
), n AS (SELECT count(*) AS nt FROM toks)
SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
       CAST(ua.c AS BIGINT) AS c_a, CAST(ub.c AS BIGINT) AS c_b,
       ln((CAST(c_ab AS DOUBLE) * nt)
          / (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE))) AS pmi
FROM big JOIN uni ua ON ua.w = big.w1
         JOIN uni ub ON ub.w = big.w2, n
ORDER BY pmi DESC, w1, w2 LIMIT 20
"""


def q_langid_confusion(sf_dir: str) -> ray.data.Dataset:
    """Language-ID confusion matrix: labeled ``lang`` vs the n-gram
    classifier's ``lang_pred`` — the evaluation table any curation
    run publishes next to its lang filter.  Per-batch (lang,
    lang_pred, n) partials (≤ L² rows each) → tiny keyed fold."""
    from ...functions.window import keyed_window

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        t = lang_id(t)
        return (
            t.select(["lang", "lang_pred"])
            .group_by(["lang", "lang_pred"])
            .aggregate([("lang", "count")])
            .rename_columns(["lang", "lang_pred", "n"])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        return (
            g.group_by(["lang", "lang_pred"])
            .aggregate([("n", "sum")])
            .rename_columns(["lang", "lang_pred", "n"])
        )

    return keyed_window(partials, "lang", fold).sort(
        ["lang", "lang_pred"]
    )


ORACLE_LANG_CONFUSION = f"""
SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
FROM ({ORACLE_LANG_ID}) GROUP BY 1, 2 ORDER BY 1, 2
"""

