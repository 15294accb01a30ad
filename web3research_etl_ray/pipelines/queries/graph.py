"""Graph composites + rule-based curation filters.

Split from the monolithic queries.py (VERDICT r04 Next #7); the
source text of every operator is unchanged — only module boundaries
and explicit imports were added.  Registered in ``queries._registry``.
"""

from ._shared import (  # noqa: F401
    Count,
    _cents,
    _read,
    key_hash64,
    np,
    pa,
    pc,
)
from .text import (  # noqa: F401
    _exact_jaccard_pairs_ds,
)
from .sim import (  # noqa: F401
    _load_queries,
)
from .fanout import (  # noqa: F401
    _big_orders,
)

# ---------------------------------------------------------------------------
# wave 5: oracle-exact graph composites + rule-based curation filters
# ---------------------------------------------------------------------------


def q_jaccard_clusters(sf_dir: str) -> pa.Table:
    """Connected components over the EXACT Jaccard >= 0.5 pair graph:
    (doc_id, cluster_id = component-min doc_id) for every doc in at
    least one pair.  Same hash-to-min label-propagation operator as
    `dedup_clusters`, but the edge set is the deterministic
    `ngram_jaccard_pairs` graph, so the WHOLE composite — 2-shuffle
    pair generation feeding O(log diameter) keyed label exchanges —
    has an exact SQL oracle: a recursive min-label CTE over the
    identical pair query.  The oracle-checked twin of the
    probabilistic MinHash clustering path (rows-only `dedup_clusters`)."""
    from ...functions.dedup import connected_components_ds

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _exact_jaccard_pairs_ds(ds).map_batches(
        lambda t: t.select(["id_a", "id_b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    rows = connected_components_ds(pairs).take_all()
    if not rows:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "cluster_id": pa.array([], pa.int64())}
        )
    return pa.Table.from_pylist(rows).sort_by("doc_id")


ORACLE_JACCARD_CLUSTERS = r"""
WITH RECURSIVE w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
live AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM live)
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE 2 * n_inter >= sa.n + sb.n - n_inter
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
nodes AS (SELECT DISTINCT u AS id FROM edges),
-- min-label reachability: walk(v, m) holds iff a path m -> v exists on
-- which every node after m is > m; the component minimum reaches every
-- member through such a path, so min(comp) per node is the component min
walk(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.v, k.comp FROM walk k JOIN edges e ON e.u = k.id
  WHERE k.comp < e.v
)
SELECT id AS doc_id, min(comp) AS cluster_id FROM walk GROUP BY id
"""


def q_triangle_count(sf_dir: str) -> pa.Table:
    """Distributed triangle count over the exact Jaccard pair graph —
    the clustering-coefficient primitive for dedup-graph diagnostics
    (a near-dup graph whose pairs close into triangles is template
    boilerplate; a star-shaped one is a hub document).

    Node-iterator shape, every stage a keyed exchange: (1) wedges are
    enumerated at their minimum endpoint (groupby id_a; vectorized
    within-segment combination indexing, no per-row loop), (2) wedge
    instances union the edge set and co-locate on a packed (lo,hi)
    key, (3) each bucket counts wedges whose closing edge is present
    (np.isin on packed int64 keys).  Degenerate hubs are already
    df-capped upstream by `_NGRAM_DF_CAP`, which bounds per-node
    degree and hence the d^2 wedge blowup."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _exact_jaccard_pairs_ds(ds).map_batches(
        lambda t: t.select(["id_a", "id_b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()  # consumed twice (wedge stage + edge side)

    _EMPTY_WE = pa.table(
        {"x": pa.array([], pa.int64()), "y": pa.array([], pa.int64()),
         "kind": pa.array([], pa.int64())}
    )

    def wedges(g: pa.Table) -> pa.Table:
        a = g.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = g.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) == 0:
            return _EMPTY_WE
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts = np.flatnonzero(segment_starts(a))
        ends = np.append(starts[1:], len(a))
        # element k (global idx) is LEFT of every later element in its
        # segment: lcounts[k] = seg_end(k) - 1 - k
        seg_end = np.repeat(ends, np.diff(np.append(starts, len(a))))
        lcounts = seg_end - 1 - np.arange(len(a))
        total = int(lcounts.sum())
        if total == 0:
            return _EMPTY_WE
        lefts = np.repeat(np.arange(len(a)), lcounts)
        offs = np.concatenate(([0], np.cumsum(lcounts)[:-1]))
        rights = (
            np.arange(total)
            - np.repeat(offs, lcounts)
            + np.repeat(np.arange(len(a)) + 1, lcounts)
        )
        return pa.table(
            {
                "x": pa.array(b[lefts], pa.int64()),
                "y": pa.array(b[rights], pa.int64()),
                "kind": pa.array(np.ones(total, np.int64), pa.int64()),
            }
        )

    wedge_ds = keyed_window(pairs, "id_a", wedges)
    edge_ds = pairs.map_batches(
        lambda t: pa.table(
            {
                "x": t.column("id_a"),
                "y": t.column("id_b"),
                "kind": pa.array(np.zeros(len(t), np.int64), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def pack(t: pa.Table) -> pa.Table:
        # doc_ids fit in 32 bits at any test scale; packing keeps the
        # exchange key a single int64 (guarded, not assumed)
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        if len(x) and (x.max() >= 2**31 or y.max() >= 2**31):
            raise ValueError("triangle_count: doc_id exceeds 31 bits")
        return t.append_column(
            "__k", pa.array((x << 32) | y, pa.int64())
        )

    both = wedge_ds.union(edge_ds).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True
    )

    def count_closed(g: pa.Table) -> pa.Table:
        k = g.column("__k").to_numpy(zero_copy_only=False)
        kind = g.column("kind").to_numpy(zero_copy_only=False)
        edge_keys = k[kind == 0]
        wedge_keys = k[kind == 1]
        n = int(np.isin(wedge_keys, edge_keys).sum())
        return pa.table({"cnt": pa.array([n], pa.int64())})

    per_bucket = keyed_window(both, "__k", count_closed)
    total = per_bucket.sum("cnt")
    return pa.table(
        {"n_triangles": pa.array([int(total or 0)], pa.int64())}
    )


ORACLE_TRIANGLES = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
live AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM live)
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE 2 * n_inter >= sa.n + sb.n - n_inter
)
SELECT count(*) AS n_triangles FROM pairs p1
JOIN pairs p2 ON p2.id_a = p1.id_a AND p2.id_b > p1.id_b
JOIN pairs p3 ON p3.id_a = p1.id_b AND p3.id_b = p2.id_b
"""


def q_gopher_quality_documents(sf_dir: str) -> pa.Table:
    """Gopher-style rule-based quality filter (Rae et al. 2021,
    published rule set, adapted to the fixture corpus): per doc, word
    count, word-char count, stopword hits, words containing an
    alphabetic char, and the keep verdict.  Every ratio rule is
    cross-multiplied to INTEGER comparisons (3*n_words <= n_word_chars
    <= 10*n_words for mean word length in [3,10]; 5*n_alpha >=
    4*n_words for the 0.8 alpha-word fraction), so parity with the SQL
    oracle is exact — no float thresholds.  One embarrassingly
    parallel map_batches over RE2 count kernels; n_word_chars equals
    the oracle's sum-of-token-lengths because \\w+ matches are maximal
    runs."""
    _STOP_RE = r"\b(the|be|to|of|and|that|have|with)\b"

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t.column("text"))
        n_words = pc.count_substring_regex(low, r"\w+").cast(pa.int64())
        n_wchars = pc.count_substring_regex(low, r"\w").cast(pa.int64())
        n_stop = pc.count_substring_regex(low, _STOP_RE).cast(pa.int64())
        n_alpha = pc.count_substring_regex(
            low, r"\w*[a-z]\w*"
        ).cast(pa.int64())
        keep = pc.and_(
            pc.and_(
                pc.and_(
                    pc.greater_equal(n_words, pa.scalar(50)),
                    pc.less_equal(n_words, pa.scalar(100000)),
                ),
                pc.and_(
                    pc.less_equal(pc.multiply(n_words, pa.scalar(3)), n_wchars),
                    pc.less_equal(n_wchars, pc.multiply(n_words, pa.scalar(10))),
                ),
            ),
            pc.and_(
                pc.greater_equal(n_stop, pa.scalar(2)),
                pc.greater_equal(
                    pc.multiply(n_alpha, pa.scalar(5)),
                    pc.multiply(n_words, pa.scalar(4)),
                ),
            ),
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_words": n_words,
                "n_word_chars": n_wchars,
                "n_stop": n_stop,
                "n_alpha_words": n_alpha,
                "keep": keep,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_GOPHER = r"""
WITH c AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n_words,
         CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0)
              AS BIGINT) AS n_word_chars,
         CAST(len(list_filter(ws,
              x -> x IN ('the','be','to','of','and','that','have','with')))
              AS BIGINT) AS n_stop,
         CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
              AS BIGINT) AS n_alpha_words
  FROM c
)
SELECT doc_id, n_words, n_word_chars, n_stop, n_alpha_words,
       (n_words BETWEEN 50 AND 100000
        AND 3 * n_words <= n_word_chars
        AND n_word_chars <= 10 * n_words
        AND n_stop >= 2
        AND 5 * n_alpha_words >= 4 * n_words) AS keep
FROM m
"""


def q_winsorize_value_events(sf_dir: str) -> pa.Table:
    """Per-type winsorization at the exact 1/8 and 7/8 discrete
    quantiles (exact binary fractions, so ceil(q*n) is float-exact —
    same convention as `quantiles_value_per_user`).  Two passes: a
    tiny per-type quantile fold (|event_type| rows — at 100 TB this
    stage's per-type sort would move to the sampled-sketch quantile
    path of `approx_quantiles_value`; the clip pass is unchanged),
    broadcast as a closure-captured dict, then one embarrassingly
    parallel clip over dictionary-encoded type codes — no second
    shuffle, no join."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def qfn(g: pa.Table) -> pa.Table:
        et = g.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        codes = np.asarray(enc.indices).astype(np.int64)
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        order = np.lexsort((cents, codes))
        codes_s, cents_s = codes[order], cents[order]
        starts = np.flatnonzero(
            np.concatenate(([True], codes_s[1:] != codes_s[:-1]))
        ) if len(codes_s) else np.zeros(0, np.int64)
        counts = np.diff(np.append(starts, len(codes_s)))
        lo_i = np.ceil(0.125 * counts).astype(np.int64) - 1
        hi_i = np.ceil(0.875 * counts).astype(np.int64) - 1
        return pa.table(
            {
                "event_type": enc.dictionary.take(
                    pa.array(codes_s[starts], pa.int64())
                ),
                "lo": pa.array(cents_s[starts + lo_i], pa.int64()),
                "hi": pa.array(cents_s[starts + hi_i], pa.int64()),
            }
        )

    bounds = {}
    for row in ds.groupby("event_type").map_groups(
        qfn, batch_format="pyarrow"
    ).take_all():
        bounds[row["event_type"]] = (row["lo"], row["hi"])

    def clip(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        vals = enc.dictionary.to_pylist()
        lo_arr = np.array([bounds[v][0] for v in vals], np.int64)
        hi_arr = np.array([bounds[v][1] for v in vals], np.int64)
        idx = np.asarray(enc.indices).astype(np.int64)
        cents = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        w = np.clip(cents, lo_arr[idx], hi_arr[idx])
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "cents": pa.array(cents, pa.int64()),
                "cents_w": pa.array(w, pa.int64()),
            }
        )

    return ds.map_batches(clip, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_WINSORIZE = """
WITH c AS (
  SELECT event_id, event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
q AS (
  SELECT event_type,
         quantile_disc(cents, 0.125) AS lo,
         quantile_disc(cents, 0.875) AS hi
  FROM c GROUP BY event_type
)
SELECT event_id, c.event_type AS event_type, cents,
       least(greatest(cents, lo), hi) AS cents_w
FROM c JOIN q ON c.event_type = q.event_type
"""


def q_pareto_events(sf_dir: str) -> pa.Table:
    """Per-user skyline (Pareto frontier) on (ts, value): keep an
    event iff no same-user event has BOTH strictly later ts and
    strictly greater value — the classic dominance query (Börzsönyi et
    al. 2001), used in curation to keep only the 'latest or best'
    rows per key.  One keyed exchange; inside each bucket a single
    lexsort (user asc, ts desc) + grouped running max over strict-ts
    predecessors, with ts-tie groups reduced via reduceat and the
    per-user cummax reset done by an int64 offset lift (loop-free;
    falls back to a per-user slice loop only if the lift could
    overflow)."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    _EMPTY = pa.table(
        {"event_id": pa.array([], pa.int64()),
         "user_id": pa.array([], pa.int64()),
         "cents": pa.array([], pa.int64())}
    )

    def fn(g: pa.Table) -> pa.Table:
        n = len(g)
        if n == 0:
            return _EMPTY
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((-ts, uid))
        uid, ts, cents, eid = uid[order], ts[order], cents[order], eid[order]
        new_uid = segment_starts(uid)
        new_grp = new_uid | np.concatenate(([True], ts[1:] != ts[:-1]))
        gstart = np.flatnonzero(new_grp)
        gmax = np.maximum.reduceat(cents, gstart)
        g_uid_start = new_uid[gstart]
        seg_id = np.cumsum(g_uid_start) - 1
        lo = int(gmax.min())
        rng = int(gmax.max()) - lo + 2
        if rng * int(seg_id[-1] + 1) < 2**62:
            lifted = (gmax - lo) + seg_id * rng
            cm = np.maximum.accumulate(lifted) - seg_id * rng + lo
        else:
            cm = gmax.copy()
            ustart = np.flatnonzero(g_uid_start)
            for s, e in zip(ustart, np.append(ustart[1:], len(gmax))):
                np.maximum.accumulate(gmax[s:e], out=cm[s:e])
        prev = np.empty(len(gmax), np.int64)
        prev[1:] = cm[:-1]
        prev[np.flatnonzero(g_uid_start)] = np.iinfo(np.int64).min
        grp_of_row = np.cumsum(new_grp) - 1
        dominated = prev[grp_of_row] > cents
        keep = ~dominated
        return pa.table(
            {
                "event_id": pa.array(eid[keep], pa.int64()),
                "user_id": pa.array(uid[keep], pa.int64()),
                "cents": pa.array(cents[keep], pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_PARETO = """
WITH c AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id, cents FROM c e
WHERE NOT EXISTS (
  SELECT 1 FROM c d
  WHERE d.user_id = e.user_id AND d.ts > e.ts AND d.cents > e.cents
)
"""


def q_full_outer_join_customer_orders(sf_dir: str) -> pa.Table:
    """FULL OUTER hash join, both sides null-extended: BUILDING-segment
    customers × high-value orders.  Restricting the left side makes
    the right-extension real (orders of non-BUILDING customers
    survive with a null segment), which `left_join_customer_orders`
    can't exercise on TPC-H's referentially-complete keys.  Same
    bucket exchange as the inner join; Acero coalesces the key
    column across sides inside each bucket (salt is rejected for full
    outer — unmatched right rows would duplicate)."""
    from ...functions.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    building = cust.map_batches(
        lambda t: t.filter(
            pc.equal(t.column("c_mktsegment"), pa.scalar("BUILDING"))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return hash_join(
        building,
        _big_orders(sf_dir),
        "c_custkey",
        left_cols=["c_mktsegment"],
        right_cols=["o_orderkey", "o_totalprice_cents"],
        how="full",
    )


ORACLE_FULL_JOIN = """
SELECT COALESCE(c.c_custkey, o.c_custkey) AS c_custkey,
       c.c_mktsegment, o.o_orderkey, o.o_totalprice_cents
FROM (
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_mktsegment = 'BUILDING'
) c
FULL JOIN (
    SELECT o_custkey AS c_custkey, o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
    FROM orders
    WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) > 45000000
) o ON o.c_custkey = c.c_custkey
"""


def q_mad_value_per_user(sf_dir: str) -> pa.Table:
    """Robust scale estimate per user: discrete median and Median
    Absolute Deviation, BOTH order statistics computed in ONE keyed
    exchange — the second pass (|x − med|, re-sort, second median)
    happens bucket-locally on arrays already in cache, so MAD costs no
    extra shuffle over the median.  Integer cents in, integer cents
    out → exact quantile_disc parity (ceil(q·n)−1 indexing, verified
    convention of `quantiles_value_per_user`)."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        order = np.lexsort((cents, uid))
        uid_s, cents_s = uid[order], cents[order]
        starts = np.flatnonzero(segment_starts(uid_s))
        counts = np.diff(np.append(starts, len(uid_s)))
        med_idx = np.ceil(0.5 * counts).astype(np.int64) - 1
        med = cents_s[starts + med_idx]
        # second order statistic over |x - med(user)|, same bucket
        seg_of = np.repeat(np.arange(len(starts)), counts)
        dev = np.abs(cents_s - med[seg_of])
        order2 = np.lexsort((dev, uid_s))
        dev_s = dev[order2]
        mad = dev_s[starts + med_idx]
        return pa.table(
            {
                "user_id": pa.array(uid_s[starts], pa.int64()),
                "med_cents": pa.array(med, pa.int64()),
                "mad_cents": pa.array(mad, pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_MAD = """
WITH c AS (
  SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
),
m AS (
  SELECT user_id, quantile_disc(cents, 0.5) AS med FROM c GROUP BY user_id
)
SELECT c.user_id AS user_id, med AS med_cents,
       quantile_disc(abs(cents - med), 0.5) AS mad_cents
FROM c JOIN m USING (user_id)
GROUP BY c.user_id, med
"""


def q_degree_histogram(sf_dir: str) -> pa.Table:
    """Degree distribution of the exact Jaccard pair graph — the
    one-line diagnostic that tells a dedup run whether its candidate
    graph is chains (degree 1–2, mirrors), cliques (templates), or a
    hub explosion (df cap misconfigured).  Two tiny keyed counts over
    the directed edge list; all integer → exact SQL parity."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _exact_jaccard_pairs_ds(ds)

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {"node": pa.array(np.concatenate([a, b]), pa.int64())}
        )

    deg = (
        pairs.map_batches(
            both_dirs, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("node")
        .aggregate(Count(alias_name="degree"))
    )
    hist = (
        deg.groupby("degree")
        .aggregate(Count(alias_name="n_nodes"))
        .take_all()
    )
    if not hist:
        return pa.table(
            {"degree": pa.array([], pa.int64()),
             "n_nodes": pa.array([], pa.int64())}
        )
    t = pa.Table.from_pylist(hist).sort_by("degree")
    return pa.table(
        {
            "degree": t.column("degree").cast(pa.int64()),
            "n_nodes": t.column("n_nodes").cast(pa.int64()),
        }
    )


def q_funnel3_click_view_purchase(sf_dir: str) -> pa.Table:
    """Three-step windowed funnel with EXISTS semantics: a click
    qualifies iff SOME view follows it within 1h that itself has SOME
    purchase within 1h — NOT greedy first-match, which misses chains
    where the first view has no purchase but a later one does.

    One keyed exchange; inside each bucket everything is loop-free:
    the three type streams are split once, each lifted by
    uid_index × (global ts range + 2h) so ONE global searchsorted per
    boundary answers every user's window query at once (windows can't
    cross users — the lift exceeds any in-user window), views carry a
    has-purchase flag counted by prefix sums, and clicks test
    flag-count > 0 over their view window.  Falls back to a per-user
    loop only if the lift could overflow int64."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    _HOUR_US = 3_600_000_000

    def fn(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"user_id": pa.array([], pa.int64()),
             "n_funnels": pa.array([], pa.int64())}
        )
        if len(g) == 0:
            return empty
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = g.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        vals = enc.dictionary.to_pylist()
        code = np.asarray(enc.indices).astype(np.int64)

        def stream(name: str):
            try:
                c = vals.index(name)
            except ValueError:
                return np.zeros(0, np.int64), np.zeros(0, np.int64)
            m = code == c
            u, t = uid[m], ts[m]
            order = np.lexsort((t, u))
            return u[order], t[order]

        cu, ct = stream("click")
        vu, vt = stream("view")
        pu, pt = stream("purchase")
        if not (len(cu) and len(vu) and len(pu)):
            return empty

        # dense uid index shared by the three streams
        all_u = np.unique(np.concatenate([cu, vu, pu]))
        lo_ts = int(min(ct.min(), vt.min(), pt.min()))
        hi_ts = int(max(ct.max(), vt.max(), pt.max()))
        lift = (hi_ts - lo_ts) + 2 * _HOUR_US + 1
        if lift * len(all_u) >= 2**62:
            return _funnel3_per_user(cu, ct, vu, vt, pu, pt)

        def lifted(u, t):
            seg = np.searchsorted(all_u, u)
            return (t - lo_ts) + seg * lift

        cl, vl, pl = lifted(cu, ct), lifted(vu, vt), lifted(pu, pt)
        # view qualifies iff a purchase lands in (vl, vl + 1h]
        v_has_p = (
            np.searchsorted(pl, vl + _HOUR_US, side="right")
            - np.searchsorted(pl, vl, side="right")
        ) > 0
        flags = np.concatenate(([0], np.cumsum(v_has_p.astype(np.int64))))
        # click qualifies iff a qualifying view lands in (cl, cl + 1h]
        n_q = (
            flags[np.searchsorted(vl, cl + _HOUR_US, side="right")]
            - flags[np.searchsorted(vl, cl, side="right")]
        )
        keep = n_q > 0
        if not keep.any():
            return empty
        ku = cu[keep]
        starts = np.flatnonzero(segment_starts(ku))
        counts = np.diff(np.append(starts, len(ku)))
        return pa.table(
            {
                "user_id": pa.array(ku[starts], pa.int64()),
                "n_funnels": pa.array(counts, pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


def _funnel3_per_user(cu, ct, vu, vt, pu, pt):
    """Overflow fallback: same semantics, per-user slices."""
    _HOUR_US = 3_600_000_000
    out_u, out_n = [], []
    for u in np.unique(cu):
        c = ct[cu == u]
        v = np.sort(vt[vu == u])
        p = np.sort(pt[pu == u])
        if not (len(c) and len(v) and len(p)):
            continue
        v_has = (np.searchsorted(p, v + _HOUR_US, side="right")
                 - np.searchsorted(p, v, side="right")) > 0
        f = np.concatenate(([0], np.cumsum(v_has.astype(np.int64))))
        nq = (f[np.searchsorted(v, c + _HOUR_US, side="right")]
              - f[np.searchsorted(v, c, side="right")])
        n = int((nq > 0).sum())
        if n:
            out_u.append(int(u))
            out_n.append(n)
    return pa.table(
        {"user_id": pa.array(out_u, pa.int64()),
         "n_funnels": pa.array(out_n, pa.int64())}
    )


def q_cohort_retention_matrix(sf_dir: str) -> pa.Table:
    """Full cohort × activity-hour retention matrix (the triangle
    chart behind `hourly_retention`'s single diagonal): users grouped
    by their FIRST active hour, distinct-user counts for every later
    hour they return.  One user-keyed exchange emits exact partial
    counts — inside a bucket each user's distinct (hour) set and
    cohort are both complete, so a kept (user, hour) row IS one
    distinct user of its (cohort, hour) cell — then a second tiny
    exchange on the packed cell key folds partials.  Cell count is
    bounded by hours², independent of corpus size."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    _HOUR_US = 3_600_000_000
    _EMPTY = pa.table(
        {"__k": pa.array([], pa.int64()),
         "n_users": pa.array([], pa.int64())}
    )

    def partial(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return _EMPTY
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hr = g.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) // _HOUR_US
        order = np.lexsort((hr, uid))
        u, h = uid[order], hr[order]
        new_u = segment_starts(u)
        sidx = np.flatnonzero(new_u)
        counts = np.diff(np.append(sidx, len(u)))
        cohort = h[sidx]  # min hour per user (h sorted within user)
        seg_of = np.repeat(np.arange(len(sidx)), counts)
        keep = new_u | np.concatenate(([True], h[1:] != h[:-1]))
        packed = (cohort[seg_of][keep] << np.int64(32)) | h[keep]
        key, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {"__k": pa.array(key, pa.int64()),
             "n_users": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    def fold(g: pa.Table) -> pa.Table:
        k = g.column("__k").to_numpy(zero_copy_only=False)
        n = g.column("n_users").to_numpy(zero_copy_only=False)
        key, inv = np.unique(k, return_inverse=True)
        tot = np.bincount(inv, weights=n).astype(np.int64)
        return pa.table(
            {"__k": pa.array(key, pa.int64()),
             "n_users": pa.array(tot, pa.int64())}
        )

    parts = keyed_window(ds, "user_id", partial)
    folded = keyed_window(parts, "__k", fold).take_all()
    if not folded:
        return pa.table(
            {"cohort_hour": pa.array([], pa.timestamp("us")),
             "hour": pa.array([], pa.timestamp("us")),
             "n_users": pa.array([], pa.int64())}
        )
    k = np.array([r["__k"] for r in folded], np.int64)
    n = np.array([r["n_users"] for r in folded], np.int64)
    order = np.argsort(k)
    k, n = k[order], n[order]
    return pa.table(
        {
            "cohort_hour": pa.array(
                (k >> np.int64(32)) * _HOUR_US, pa.int64()
            ).cast(pa.timestamp("us")),
            "hour": pa.array(
                (k & np.int64(0xFFFFFFFF)) * _HOUR_US, pa.int64()
            ).cast(pa.timestamp("us")),
            "n_users": pa.array(n, pa.int64()),
        }
    )


ORACLE_COHORT_MATRIX = """
WITH uh AS (
  SELECT DISTINCT user_id, date_trunc('hour', ts) AS hour FROM events
),
c AS (SELECT user_id, min(hour) AS cohort_hour FROM uh GROUP BY user_id)
SELECT cohort_hour, hour, CAST(count(*) AS BIGINT) AS n_users
FROM uh JOIN c USING (user_id)
GROUP BY cohort_hour, hour
"""


ORACLE_FUNNEL3 = """
WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
vq AS (
  SELECT v.user_id, v.ts FROM v WHERE EXISTS (
    SELECT 1 FROM p WHERE p.user_id = v.user_id
      AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR)
),
cq AS (
  SELECT c.user_id FROM c WHERE EXISTS (
    SELECT 1 FROM vq WHERE vq.user_id = c.user_id
      AND vq.ts > c.ts AND vq.ts <= c.ts + INTERVAL 1 HOUR)
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_funnels
FROM cq GROUP BY user_id
"""


def q_knn_ivf_incremental(sf_dir: str) -> pa.Table:
    """Incremental ANN at ingest: the embeddings table arrives in two
    doc-id-ordered ticks into a persistent `IvfIndex` (frozen coarse
    quantizer, one file per cell per tick), then the standard fixture
    queries probe only their cells' directories.  Exactness-within-
    probe, incremental==one-shot, dir-pruning and frozen-quantizer
    contracts are pinned in tests/test_ann_index.py; rows-only at the
    driver gate (ANN results are probe-dependent)."""
    import shutil
    import tempfile

    from ..ann_index import IvfIndex

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def half(lo: int, hi: int):
        return ds.map_batches(
            lambda t, _lo=lo, _hi=hi: t.filter(
                pc.and_(
                    pc.greater_equal(t.column("vec_id"), pa.scalar(_lo)),
                    pc.less(t.column("vec_id"), pa.scalar(_hi)),
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    ids, mat = _load_queries(sf_dir)
    root = tempfile.mkdtemp(prefix="ivf_idx_")
    try:
        idx = IvfIndex(root, n_centroids=16)
        idx.add_tick(half(0, 500))
        idx.add_tick(half(500, 10**9))
        out = idx.query(ids, mat, k=10, n_probe=4)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out.select(["query_id", "neighbor_id", "rank"])


def q_trimmed_sum_per_user(sf_dir: str) -> pa.Table:
    """Per-user trimmed sum: drop the bottom and top floor(n/8) events
    by (cents, event_id) rank, sum the middle — the robust aggregate
    that survives sensor spikes and fat-finger values.  One keyed
    exchange, one lexsort per bucket, then a padded prefix-sum gives
    every user's middle-slice sum with two gathers (no masks, no
    second pass).  Integer in, integer out → exact SQL parity against
    the window-function oracle."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, cents, uid))
        uid_s, cents_s = uid[order], cents[order]
        starts = np.flatnonzero(segment_starts(uid_s))
        counts = np.diff(np.append(starts, len(uid_s)))
        k = counts // 8
        cs = np.concatenate(([0], np.cumsum(cents_s)))
        ends = starts + counts
        s_mid = cs[ends - k] - cs[starts + k]
        return pa.table(
            {
                "user_id": pa.array(uid_s[starts], pa.int64()),
                "n_mid": pa.array(counts - 2 * k, pa.int64()),
                "sum_mid_cents": pa.array(s_mid, pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_TRIMMED = """
WITH c AS (
  SELECT user_id, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT user_id, cents,
         row_number() OVER (
             PARTITION BY user_id ORDER BY cents, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM c
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_mid,
       CAST(sum(cents) AS BIGINT) AS sum_mid_cents
FROM r WHERE rn > n // 8 AND rn <= n - n // 8
GROUP BY user_id
"""


def q_throttle_dedup_events(sf_dir: str) -> pa.Table:
    """CDC debounce: drop an event if the SAME (user, type, cents)
    tuple fired within the previous hour — the at-least-once-delivery
    / double-click suppressor that runs at ingest in a change-data
    pipeline.  Rows co-locate on a 64-bit composite key hash (one
    exchange); inside each bucket the TRUE key columns are re-compared
    (hash collisions only co-locate, never merge), a single lexsort
    orders each key's events by (ts, event_id), and the lag compare is
    one shifted subtraction."""
    from ...functions.hashing import key_hash64
    from ...functions.window import keyed_window

    ds = _read(
        sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"]
    )

    def add_key(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("value"))
        h = key_hash64(
            t.column("user_id"), t.column("event_type"), cents
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "event_type": t.column("event_type"),
                "cents": cents,
                "__key": pa.array(h, pa.int64()),
            }
        )

    keyed = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
    _HOUR_US = 3_600_000_000

    def fn(g: pa.Table) -> pa.Table:
        n = len(g)
        if n == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "event_type": pa.array([], pa.string()),
                 "cents": pa.array([], pa.int64())}
            )
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        et = g.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        code = np.asarray(et.dictionary_encode().indices).astype(np.int64)
        cents = g.column("cents").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, cents, code, uid))
        uid_s, code_s, cents_s, ts_s = (
            uid[order], code[order], cents[order], ts[order]
        )
        new_key = np.concatenate(
            ([True],
             (uid_s[1:] != uid_s[:-1]) | (code_s[1:] != code_s[:-1])
             | (cents_s[1:] != cents_s[:-1]))
        )
        gap_ok = np.concatenate(([True], ts_s[1:] - ts_s[:-1] > _HOUR_US))
        keep = new_key | gap_ok
        sel = order[keep]
        return pa.table(
            {
                "event_id": pa.array(eid[sel], pa.int64()),
                "user_id": pa.array(uid[sel], pa.int64()),
                "event_type": et.take(pa.array(sel, pa.int64())),
                "cents": pa.array(cents[sel], pa.int64()),
            }
        )

    return keyed_window(keyed, "__key", fn)


ORACLE_THROTTLE = """
WITH c AS (
  SELECT event_id, user_id, event_type, ts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
l AS (
  SELECT *, lag(ts) OVER (
      PARTITION BY user_id, event_type, cents
      ORDER BY ts, event_id) AS prev_ts
  FROM c
)
SELECT event_id, user_id, event_type, cents FROM l
WHERE prev_ts IS NULL OR ts - prev_ts > INTERVAL 1 HOUR
"""


ORACLE_DEGREES = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
live AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  WHERE a.s IN (SELECT s FROM live)
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE 2 * n_inter >= sa.n + sb.n - n_inter
),
edges AS (
  SELECT id_a AS u FROM pairs UNION ALL SELECT id_b FROM pairs
),
deg AS (SELECT u, count(*) AS degree FROM edges GROUP BY u)
SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree
"""


