"""Grouped statistics waves: regression, entropy, heatmaps, streaks.

Split from the monolithic queries.py (VERDICT r04 Next #7); the
source text of every operator is unchanged — only module boundaries
and explicit imports were added.  Registered in ``queries._registry``.
"""

from ._shared import (  # noqa: F401
    Count,
    Min,
    Sum,
    _cents,
    _from_rows,
    _read,
    key_hash64,
    np,
    pa,
    pc,
)
from .text import (  # noqa: F401
    _exact_jaccard_pairs_ds,
)

# ---------------------------------------------------------------------------
# wave 6: grouped regression, entropy, first-seen cumulative distinct,
#         co-occurrence, gap stats, 2-hop reachability
# ---------------------------------------------------------------------------


def q_regr_value_on_ts_per_user(sf_dir: str) -> pa.Table:
    """Grouped least-squares line value ~ time per user — the trend
    primitive behind drift monitors.  Shares q_corr_value_ts_per_user's
    integer-moment design: per-batch partials ship exact BIGINTs
    (n, Σx, Σy, Σx², Σxy) with x = whole minutes since the global min
    ts and y = cents, the keyed hash-bucket fold sums them, and the
    float64 tail (slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx),
    intercept = (Σy − slope·Σx)/n) is mirrored token-for-token in the
    oracle so even the floats are bit-identical."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    min_us = ds.aggregate(Min("ts"))["min(ts)"]
    min_us = pa.scalar(min_us).cast(pa.timestamp("us")).cast(pa.int64()).as_py()

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        x = (
            t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False) - min_us
        ) // 60_000_000
        y = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid, x, y = uid[order], x[order], y[order]
        keys, starts = np.unique(uid, return_index=True)
        n = np.diff(np.append(starts, len(uid)))
        cols = {
            "user_id": pa.array(keys, pa.int64()),
            "n_events": pa.array(n, pa.int64()),
        }
        for name, v in (("sx", x), ("sy", y), ("sxx", x * x), ("sxy", x * y)):
            cols[name] = pa.array(np.add.reduceat(v, starts), pa.int64())
        return pa.table(cols)

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid = uid[order]
        starts = np.flatnonzero(segment_starts(uid))
        cols = {"user_id": pa.array(uid[starts], pa.int64())}
        acc = {}
        for c in ("n_events", "sx", "sy", "sxx", "sxy"):
            v = g.column(c).to_numpy(zero_copy_only=False)[order]
            acc[c] = np.add.reduceat(v, starts)
        # float64 tail, op order mirrored in ORACLE_REGR exactly
        n = acc["n_events"].astype(np.float64)
        sx, sy = acc["sx"].astype(np.float64), acc["sy"].astype(np.float64)
        sxx = acc["sxx"].astype(np.float64)
        sxy = acc["sxy"].astype(np.float64)
        den = n * sxx - sx * sx
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = (n * sxy - sx * sy) / den
            intercept = (sy - slope * sx) / n
        cols["n_events"] = pa.array(acc["n_events"], pa.int64())
        # zero-time-variance groups are NULL (matches the oracle CASE)
        cols["slope_cents_per_min"] = pa.Array.from_pandas(
            np.where(den == 0.0, np.nan, slope)
        ).cast(pa.float64())
        cols["intercept_cents"] = pa.Array.from_pandas(
            np.where(den == 0.0, np.nan, intercept)
        ).cast(pa.float64())
        t = pa.table(cols)
        return t.filter(pc.greater_equal(t.column("n_events"), 2))

    return keyed_window(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "user_id",
        fold,
    ).sort("user_id")


ORACLE_REGR = """
WITH m AS (SELECT min(epoch_us(ts)) AS t0 FROM events),
b AS (
  SELECT user_id,
         (epoch_us(ts) - (SELECT t0 FROM m)) // 60000000 AS x,
         CAST(ROUND(value * 100) AS BIGINT) AS y
  FROM events
),
s AS (
  SELECT user_id,
         count(*) AS n_events,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM b GROUP BY user_id
),
d AS (
  SELECT user_id, n_events, sx, sy, sxx, sxy,
         CAST(n_events AS DOUBLE) * CAST(sxx AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
         CASE WHEN CAST(n_events AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
              THEN NULL
              ELSE (CAST(n_events AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n_events AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         END AS slope
  FROM s
)
SELECT user_id, n_events, slope AS slope_cents_per_min,
       CASE WHEN den = 0 THEN NULL
            ELSE (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                 / CAST(n_events AS DOUBLE)
       END AS intercept_cents
FROM d WHERE n_events >= 2
ORDER BY user_id
"""


def q_entropy_types_per_user(sf_dir: str) -> pa.Table:
    """Shannon entropy (bits) of each user's event-type distribution —
    the behavioral-diversity feature.  Integer (user, type) counts fold
    exactly across the keyed exchange; the float tail
    H = log2(N) − (Σ cᵢ·log2 cᵢ)/N sums the per-type terms
    SEQUENTIALLY in event_type order (padded column-walk across users,
    not np pairwise reduction) so it is bit-identical to the oracle's
    ``list_sum(list(term ORDER BY event_type))`` — verified: numpy's
    pairwise ``add.reduce`` diverges from DuckDB in the last ulp even
    at 8 terms, sequential accumulation does not.  log2 itself goes
    through libm (``math.log2``, what DuckDB calls) over the DISTINCT
    integer counts only — ``np.log2``'s SIMD path is 1 ulp off libm on
    some inputs (e.g. 75, 52)."""
    import math

    from ...functions.window import keyed_window, segment_starts

    def log2_libm(ints: np.ndarray) -> np.ndarray:
        # O(distinct integer values) libm calls, vectorized map-back
        uniq, inv = np.unique(ints, return_inverse=True)
        vals = np.array([math.log2(float(x)) for x in uniq], np.float64)
        return vals[inv]

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "user_id": t.column("user_id").cast(pa.int64()),
                    "event_type": t.column("event_type"),
                }
            )
            .group_by(["user_id", "event_type"])
            .aggregate([("user_id", "count")])
            .rename_columns(["user_id", "event_type", "n"])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        typ = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((typ, uid))
        uid, typ, n = uid[order], typ[order], n[order]
        # combine partial counts for the same (user, type)
        new = np.ones(len(uid), dtype=bool)
        new[1:] = (uid[1:] != uid[:-1]) | (typ[1:] != typ[:-1])
        starts = np.flatnonzero(new)
        c = np.add.reduceat(n, starts)
        uid, typ = uid[starts], typ[starts]
        ustarts = np.flatnonzero(segment_starts(uid))
        useg = np.cumsum(segment_starts(uid)) - 1  # user ordinal per row
        pos = np.arange(len(uid)) - ustarts[useg]  # rank of type in user
        N = np.add.reduceat(c, ustarts)
        n_types = np.diff(np.append(ustarts, len(uid)))
        terms = c.astype(np.float64) * log2_libm(c)
        s = np.zeros(len(ustarts), dtype=np.float64)
        for k in range(int(pos.max()) + 1 if len(pos) else 0):
            rows = pos == k  # k-th type of every user, in type order
            s[useg[rows]] += terms[rows]
        nf = N.astype(np.float64)
        return pa.table(
            {
                "user_id": pa.array(uid[ustarts], pa.int64()),
                "n_events": pa.array(N, pa.int64()),
                "n_types": pa.array(n_types, pa.int64()),
                "entropy_bits": pa.array(
                    log2_libm(N) - s / nf, pa.float64()
                ),
            }
        )

    return keyed_window(partials, "user_id", fold).sort("user_id")


ORACLE_ENTROPY = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT user_id,
         CAST(sum(n) AS BIGINT) AS n_events,
         count(*) AS n_types,
         list_sum(list(CAST(n AS DOUBLE) * log2(CAST(n AS DOUBLE))
                       ORDER BY event_type)) AS sl
  FROM c GROUP BY user_id
)
SELECT user_id, n_events, n_types,
       log2(CAST(n_events AS DOUBLE)) - sl / CAST(n_events AS DOUBLE)
         AS entropy_bits
FROM s ORDER BY user_id
"""


def q_cumulative_distinct_users(sf_dir: str) -> pa.Table:
    """Audience-growth curve: per event-hour the number of NEVER-
    before-seen users plus the running cumulative total.  Each user's
    first-seen timestamp folds as an integer min across the keyed
    exchange (per-batch partial mins, one row per (user, batch)); only
    per-hour new-user counts reach the driver, which carries the
    running total over O(hours) rows — the first-occurrence trick that
    turns a windowed COUNT(DISTINCT) into an ordinary sum."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        us = (
            t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((us, uid))
        uid, us = uid[order], us[order]
        starts = np.flatnonzero(segment_starts(uid))
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "first_us": pa.array(us[starts], pa.int64()),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        us = g.column("first_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((us, uid))
        uid, us = uid[order], us[order]
        starts = np.flatnonzero(segment_starts(uid))
        first = us[starts]
        hour = first // 3_600_000_000 * 3_600_000_000
        hours, cnt = np.unique(hour, return_counts=True)
        return pa.table(
            {
                "hour_us": pa.array(hours, pa.int64()),
                "n_new": pa.array(cnt, pa.int64()),
            }
        )

    rows = (
        keyed_window(partials, "user_id", fold)
        .groupby("hour_us")
        .aggregate(Sum("n_new", alias_name="n_new"))
        .take_all()
    )  # O(distinct hours) — the only driver-side state
    t = _from_rows(rows, {"hour_us": pa.int64(), "n_new": pa.int64()})
    t = t.sort_by("hour_us")
    n_new = t.column("n_new").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "hour": t.column("hour_us").cast(pa.timestamp("us")),
            "n_new": t.column("n_new"),
            "cum_users": pa.array(np.cumsum(n_new), pa.int64()),
        }
    )


ORACLE_CUM_DISTINCT = """
WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id),
h AS (
  SELECT date_trunc('hour', first_ts) AS hour, count(*) AS n_new
  FROM f GROUP BY 1
)
SELECT hour, n_new,
       CAST(sum(n_new) OVER (ORDER BY hour) AS BIGINT) AS cum_users
FROM h ORDER BY hour
"""


def q_type_cooccurrence(sf_dir: str) -> pa.Table:
    """Market-basket support: for every unordered pair of event types,
    how many users did both — the co-occurrence matrix behind lift /
    association rules.  Per-batch distinct (user, type) partials fold
    to global distinct in the user's bucket, per-user pairs are
    generated by looping over distinct SEGMENT LENGTHS (≤ #types, not
    #users: all users with k types pair up in one (m, k) matrix op),
    and only (type_a, type_b, count) rows — at most |types|² of them —
    leave each bucket."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "user_id": t.column("user_id").cast(pa.int64()),
                    "event_type": t.column("event_type"),
                }
            )
            .group_by(["user_id", "event_type"])
            .aggregate([])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        typ = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((typ, uid))
        uid, typ = uid[order], typ[order]
        new = np.ones(len(uid), dtype=bool)
        new[1:] = (uid[1:] != uid[:-1]) | (typ[1:] != typ[:-1])
        uid, typ = uid[new], typ[new]  # global distinct (bucket owns user)
        starts = np.flatnonzero(segment_starts(uid))
        sizes = np.diff(np.append(starts, len(uid)))
        a_parts, b_parts = [], []
        for L in np.unique(sizes):
            if L < 2:
                continue
            seg = starts[sizes == L]
            mat = typ[seg[:, None] + np.arange(L)[None, :]]  # (m, L) sorted
            for i in range(int(L) - 1):
                for j in range(i + 1, int(L)):
                    a_parts.append(mat[:, i])
                    b_parts.append(mat[:, j])
        if not a_parts:
            return pa.table(
                {
                    "type_a": pa.array([], pa.string()),
                    "type_b": pa.array([], pa.string()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        pairs = pa.table(
            {
                "type_a": pa.array(np.concatenate(a_parts), pa.string()),
                "type_b": pa.array(np.concatenate(b_parts), pa.string()),
            }
        )
        out = pairs.group_by(["type_a", "type_b"]).aggregate(
            [("type_a", "count")]
        )
        return out.rename_columns(["type_a", "type_b", "n_users"])

    rows = (
        keyed_window(partials, "user_id", fold)
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .take_all()
    )  # ≤ |types|² rows
    return _from_rows(
        rows,
        {"type_a": pa.string(), "type_b": pa.string(), "n_users": pa.int64()},
    ).sort_by([("type_a", "ascending"), ("type_b", "ascending")])


ORACLE_COOCCUR = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*) AS n_users
FROM d a JOIN d b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_activity_gaps_per_user(sf_dir: str) -> pa.Table:
    """Per-user inactivity profile: event count, largest gap between
    consecutive events (µs, exact integer), and how many gaps exceeded
    one hour — the churn-risk features.  One keyed exchange, one
    lexsort per bucket, vectorized diffs; single-event users get a
    NULL max gap, matching SQL max() over an empty lag set."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        us = (
            g.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((eid, us, uid))
        uid, us = uid[order], us[order]
        starts = segment_starts(uid)
        start_idx = np.flatnonzero(starts)
        d = np.empty(len(us), dtype=np.int64)
        d[0] = -1
        d[1:] = us[1:] - us[:-1]
        d[starts] = -1  # first row of each user has no gap
        gmax = np.maximum.reduceat(d, start_idx)
        n_events = np.diff(np.append(start_idx, len(uid)))
        n_gaps = np.add.reduceat(
            (d > 3_600_000_000).astype(np.int64), start_idx
        )
        return pa.table(
            {
                "user_id": pa.array(uid[start_idx], pa.int64()),
                "n_events": pa.array(n_events, pa.int64()),
                "max_gap_us": pc.if_else(
                    pa.array(gmax < 0),
                    pa.nulls(len(gmax), pa.int64()),
                    pa.array(gmax, pa.int64()),
                ),
                "n_gaps_1h": pa.array(n_gaps, pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fold).sort("user_id")


ORACLE_GAPS = """
WITH l AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id)) AS gap
  FROM events
)
SELECT user_id, count(*) AS n_events,
       max(gap) AS max_gap_us,
       CAST(count(*) FILTER (WHERE gap > 3600000000) AS BIGINT)
         AS n_gaps_1h
FROM l GROUP BY user_id ORDER BY user_id
"""


def q_khop2_reachability(sf_dir: str) -> pa.Table:
    """2-hop neighborhood size per node of the exact-Jaccard dedup
    graph — how big each doc's transitive-duplicate blast radius is
    before full closure.  Three bounded keyed exchanges: (1) middle-
    node buckets turn each neighbor list into i<j wedge pairs (looped
    over segment LENGTHS like q_type_cooccurrence, so a degree-d node
    costs d² rows but no Python per-node work), (2) pair buckets
    dedup wedges ∪ direct edges vectorized, (3) node buckets count
    distinct partners.  Degree is bounded by the dedup graph's df cap
    upstream, so d² stays small — same assumption q_triangle_count
    documents."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _exact_jaccard_pairs_ds(ds)

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, b]), pa.int64()),
                "v": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True)

    def wedges(g: pa.Table) -> pa.Table:
        # bucket key = u (middle node): neighbors of each u pair up
        u = g.column("u").to_numpy(zero_copy_only=False)
        v = g.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(segment_starts(u))
        sizes = np.diff(np.append(starts, len(u)))
        a_parts, b_parts = [], []
        for L in np.unique(sizes):
            if L < 2:
                continue
            seg = starts[sizes == L]
            mat = v[seg[:, None] + np.arange(L)[None, :]]  # sorted rows
            for i in range(int(L) - 1):
                for j in range(i + 1, int(L)):
                    a_parts.append(mat[:, i])
                    b_parts.append(mat[:, j])
        # wedge endpoints plus the direct edges themselves (a < b)
        keep = u < v
        a_parts.append(u[keep])
        b_parts.append(v[keep])
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_parts), pa.int64()),
                "b": pa.array(np.concatenate(b_parts), pa.int64()),
            }
        )

    cand = keyed_window(edges, "u", wedges)

    def dedup_pairs(g: pa.Table) -> pa.Table:
        # bucket key = a: every copy of an (a, b) pair lands here
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        new = np.ones(len(a), dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        a, b = a[new], b[new]
        return pa.table(
            {"node": pa.array(np.concatenate([a, b]), pa.int64())}
        )

    reach = keyed_window(cand, "a", dedup_pairs)
    rows = (
        reach.groupby("node")
        .aggregate(Count(alias_name="n_within_2"))
        .take_all()
    )
    return _from_rows(
        rows, {"node": pa.int64(), "n_within_2": pa.int64()}
    ).sort_by("node")


ORACLE_KHOP2 = r"""
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
sym AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
two AS (
  SELECT a.u AS u, b.v AS v FROM sym a JOIN sym b
  ON a.v = b.u WHERE b.v <> a.u
),
reach AS (SELECT u, v FROM sym UNION SELECT u, v FROM two)
SELECT u AS node, count(*) AS n_within_2 FROM reach
GROUP BY u ORDER BY node
"""


# ---------------------------------------------------------------------------
# wave 7: time-weighted average, inter-arrival quantiles, cluster-size
#         histogram, per-doc unigram KL divergence
# ---------------------------------------------------------------------------


def q_twap_value_per_user(sf_dir: str) -> pa.Table:
    """Time-weighted average value per user (trapezoidal): the metric
    that doesn't overweight burst periods.  One keyed exchange; per
    consecutive pair the term (cᵢ + cᵢ₊₁)·Δµs is an EXACT int64
    (cents × span < 2⁶³ holds through ~10⁶× the fixture range; a
    100 TB deployment with wider spans would split hi/lo words), so
    the numerator folds order-independently and only the final
    division is float — mirrored in the oracle, bit-identical."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        us = (
            g.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        uid, us, cents = uid[order], us[order], cents[order]
        starts = segment_starts(uid)
        start_idx = np.flatnonzero(starts)
        end_idx = np.append(start_idx[1:], len(uid)) - 1
        term = np.zeros(len(uid), dtype=np.int64)
        if len(uid) > 1:
            term[:-1] = (cents[:-1] + cents[1:]) * (us[1:] - us[:-1])
        term[end_idx] = 0  # no pair crosses a user boundary
        num = np.add.reduceat(term, start_idx)
        den = us[end_idx] - us[start_idx]
        n_events = np.diff(np.append(start_idx, len(uid)))
        with np.errstate(divide="ignore", invalid="ignore"):
            twap = num.astype(np.float64) / (2.0 * den.astype(np.float64))
        return pa.table(
            {
                "user_id": pa.array(uid[start_idx], pa.int64()),
                "n_events": pa.array(n_events, pa.int64()),
                "twap_cents": pa.Array.from_pandas(
                    np.where(den == 0, np.nan, twap)
                ).cast(pa.float64()),
            }
        )

    return keyed_window(ds, "user_id", fold).sort("user_id")


ORACLE_TWAP = """
WITH c AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
l AS (
  SELECT user_id, us, cents,
         lead(us) OVER w AS us2, lead(cents) OVER w AS c2
  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT user_id, count(*) AS n_events,
         CAST(sum((cents + c2) * (us2 - us)) AS BIGINT) AS num,
         max(us) - min(us) AS den
  FROM l GROUP BY user_id
)
SELECT user_id, n_events,
       CASE WHEN den = 0 THEN NULL
            ELSE CAST(num AS DOUBLE) / (2 * CAST(den AS DOUBLE))
       END AS twap_cents
FROM s ORDER BY user_id
"""


def q_interarrival_quantiles_per_type(sf_dir: str) -> pa.Table:
    """Per event-type inter-arrival profile: exact p50/p90 (DuckDB
    ``quantile_disc`` semantics, index ⌈q·n⌉−1 of the sorted gaps)
    and max gap in µs.  Keyed exchange on event_type, two lexsorts per
    bucket (arrival order for diffs, gap order for the order
    statistics), all-integer output."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["event_id", "event_type", "ts"])

    def with_type_h(t: pa.Table) -> pa.Table:
        return t.append_column(
            "type_h",
            pa.array(
                (key_hash64(t.column("event_type")) % np.uint64(1 << 62))
                .astype(np.int64),
                pa.int64(),
            ),
        )

    keyed = ds.map_batches(
        with_type_h, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        typ = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        us = (
            g.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((eid, us, typ))
        typ, us = typ[order], us[order]
        starts = segment_starts(typ)
        gap = np.empty(len(us), dtype=np.int64)
        gap[0] = -1
        gap[1:] = us[1:] - us[:-1]
        gap[starts] = -1
        keep = gap >= 0
        tseg, gap = typ[keep], gap[keep]
        if not len(gap):
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n_gaps": pa.array([], pa.int64()),
                    "p50_gap_us": pa.array([], pa.int64()),
                    "p90_gap_us": pa.array([], pa.int64()),
                    "max_gap_us": pa.array([], pa.int64()),
                }
            )
        order2 = np.lexsort((gap, tseg))
        tseg, gap = tseg[order2], gap[order2]
        s2 = np.flatnonzero(segment_starts(tseg))
        n = np.diff(np.append(s2, len(gap)))
        i50 = s2 + np.ceil(0.5 * n).astype(np.int64) - 1
        i90 = s2 + np.ceil(0.9 * n).astype(np.int64) - 1
        return pa.table(
            {
                "event_type": pa.array(tseg[s2], pa.string()),
                "n_gaps": pa.array(n, pa.int64()),
                "p50_gap_us": pa.array(gap[i50], pa.int64()),
                "p90_gap_us": pa.array(gap[i90], pa.int64()),
                "max_gap_us": pa.array(
                    gap[np.append(s2[1:], len(gap)) - 1], pa.int64()
                ),
            }
        )

    return keyed_window(keyed, "type_h", fold).sort("event_type")


ORACLE_INTERARRIVAL = """
WITH l AS (
  SELECT event_type,
         epoch_us(ts) - epoch_us(lag(ts) OVER (
             PARTITION BY event_type ORDER BY ts, event_id)) AS gap
  FROM events
)
SELECT event_type, count(*) AS n_gaps,
       quantile_disc(gap, 0.5) AS p50_gap_us,
       quantile_disc(gap, 0.9) AS p90_gap_us,
       max(gap) AS max_gap_us
FROM l WHERE gap IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


def q_cluster_size_histogram(sf_dir: str) -> pa.Table:
    """Size distribution of the exact-Jaccard duplicate clusters — the
    one-table answer to 'is my near-dup corpus mirrors (many 2s) or
    template spam (few giants)?'.  Rides q_jaccard_clusters' machinery
    (2-shuffle pair generation + O(log diameter) label propagation)
    and folds to O(distinct sizes) rows."""
    from ray.data.aggregate import Count as _Count

    from ...functions.dedup import connected_components_ds

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _exact_jaccard_pairs_ds(ds).map_batches(
        lambda t: t.select(["id_a", "id_b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    comp = connected_components_ds(pairs)
    rows = (
        comp.groupby("cluster_id")
        .aggregate(_Count(alias_name="cluster_size"))
        .groupby("cluster_size")
        .aggregate(_Count(alias_name="n_clusters"))
        .take_all()
    )
    return _from_rows(
        rows, {"cluster_size": pa.int64(), "n_clusters": pa.int64()}
    ).sort_by("cluster_size")


ORACLE_CLUSTER_SIZES = r"""
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
walk(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.v, k.comp FROM walk k JOIN edges e ON e.u = k.id
  WHERE k.comp < e.v
),
cm AS (SELECT id, min(comp) AS cluster_id FROM walk GROUP BY id),
cs AS (SELECT cluster_id, count(*) AS cluster_size FROM cm GROUP BY 1)
SELECT cluster_size, count(*) AS n_clusters
FROM cs GROUP BY 1 ORDER BY 1
"""


def q_kl_unigram_documents(sf_dir: str) -> pa.Table:
    """Per-document unigram KL divergence vs the corpus distribution —
    the CCNet/DSIR-style domain-shift signal.  Shape: per-batch
    (doc, token, c) counts (docs arrive whole, so counts are final),
    one token-keyed exchange attaches the corpus count C per token,
    one doc-keyed exchange folds Σ (c/N)·(((log2 c + log2 T) − log2 N)
    − log2 C) with the terms summed SEQUENTIALLY in token order
    (contiguous pos-slice walk, O(rows) total) and every log2 routed
    through libm over DISTINCT integers — bit-identical to the
    oracle's ordered list_sum.  T (corpus token total) is one extra
    streaming count pass; a production lake would persist it as a
    corpus statistic."""
    import math

    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def doc_term(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")), pattern=r"\W+"
        )
        flat = pc.list_flatten(toks)
        doc = pc.list_parent_indices(toks)
        doc = pc.take(t.column("doc_id"), doc)
        keep = pc.greater(pc.utf8_length(flat), 0)
        return (
            pa.table({"doc_id": doc.cast(pa.int64()), "token": flat})
            .filter(keep)
            .group_by(["doc_id", "token"])
            .aggregate([("token", "count")])
            .rename_columns(["doc_id", "token", "c"])
        )

    dt = ds.map_batches(doc_term, batch_format="pyarrow", zero_copy_batch=True)

    # corpus token total T: one streaming scalar pass
    def count_tokens(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")), pattern=r"\W+"
        )
        flat = pc.list_flatten(toks)
        n = pc.sum(pc.greater(pc.utf8_length(flat), 0).cast(pa.int64()))
        return pa.table({"n": pa.array([n.as_py() or 0], pa.int64())})

    T = (
        ds.map_batches(count_tokens, batch_format="pyarrow",
                       zero_copy_batch=True)
        .aggregate(Sum("n"))["sum(n)"]
    )
    log2T = math.log2(float(T))

    def with_tok_h(t: pa.Table) -> pa.Table:
        return t.append_column(
            "tok_h",
            pa.array(
                (key_hash64(t.column("token")) % np.uint64(1 << 62)).astype(
                    np.int64
                ),
                pa.int64(),
            ),
        )

    keyed = dt.map_batches(
        with_tok_h, batch_format="pyarrow", zero_copy_batch=True
    )

    def attach_C(g: pa.Table) -> pa.Table:
        # bucket owns its tokens: corpus count = in-bucket segment sum
        tok = np.asarray(g.column("token").to_pylist(), dtype=object)
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(tok, kind="stable")
        tok, doc, c = tok[order], doc[order], c[order]
        starts = segment_starts(tok)
        start_idx = np.flatnonzero(starts)
        seg = np.cumsum(starts) - 1
        C = np.add.reduceat(c, start_idx)[seg]
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "token": pa.array(tok, pa.string()),
                "c": pa.array(c, pa.int64()),
                "C": pa.array(C, pa.int64()),
            }
        )

    with_C = keyed_window(keyed, "tok_h", attach_C)

    def log2_libm(ints: np.ndarray) -> np.ndarray:
        uniq, inv = np.unique(ints, return_inverse=True)
        vals = np.array([math.log2(float(x)) for x in uniq], np.float64)
        return vals[inv]

    def fold(g: pa.Table) -> pa.Table:
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        tok = np.asarray(g.column("token").to_pylist(), dtype=object)
        c = g.column("c").to_numpy(zero_copy_only=False)
        C = g.column("C").to_numpy(zero_copy_only=False)
        order = np.lexsort((tok, doc))
        doc, tok, c, C = doc[order], tok[order], c[order], C[order]
        starts = segment_starts(doc)
        start_idx = np.flatnonzero(starts)
        dseg = np.cumsum(starts) - 1
        N = np.add.reduceat(c, start_idx)
        pos = np.arange(len(doc)) - start_idx[dseg]
        terms = (c.astype(np.float64) / N.astype(np.float64)[dseg]) * (
            ((log2_libm(c) + log2T) - log2_libm(N)[dseg]) - log2_libm(C)
        )
        # sequential in-token-order sum: walk pos classes over
        # CONTIGUOUS slices (O(rows) total, not O(rows × max_pos))
        s = np.zeros(len(start_idx), dtype=np.float64)
        order2 = np.lexsort((dseg, pos))
        pos2, dseg2, terms2 = pos[order2], dseg[order2], terms[order2]
        bounds = np.append(
            np.flatnonzero(np.diff(pos2)) + 1, [0, len(pos2)]
        )
        bounds = np.unique(bounds)
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            s[dseg2[lo:hi]] += terms2[lo:hi]
        return pa.table(
            {
                "doc_id": pa.array(doc[start_idx], pa.int64()),
                "n_tokens": pa.array(N, pa.int64()),
                "kl_bits": pa.array(s, pa.float64()),
            }
        )

    return keyed_window(with_C, "doc_id", fold).sort("doc_id")


ORACLE_KL_UNIGRAM = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
tok AS (SELECT doc_id, unnest(ws) AS token FROM w),
dt AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
dn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS N FROM dt GROUP BY 1),
ct AS (SELECT token, CAST(sum(c) AS BIGINT) AS C FROM dt GROUP BY 1),
tt AS (SELECT CAST(sum(c) AS BIGINT) AS T FROM dt),
terms AS (
  SELECT dt.doc_id, dt.token, dn.N,
         (CAST(dt.c AS DOUBLE) / CAST(dn.N AS DOUBLE)) *
         (((log2(CAST(dt.c AS DOUBLE))
            + log2(CAST((SELECT T FROM tt) AS DOUBLE)))
           - log2(CAST(dn.N AS DOUBLE)))
          - log2(CAST(ct.C AS DOUBLE))) AS term
  FROM dt
  JOIN dn USING (doc_id)
  JOIN ct USING (token)
)
SELECT doc_id, any_value(N) AS n_tokens,
       list_sum(list(term ORDER BY token)) AS kl_bits
FROM terms GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# wave 8: Benford digits, weekday×hour heatmap, lag-1 autocorrelation,
#         same-type streaks
# ---------------------------------------------------------------------------


def q_benford_value_digits(sf_dir: str) -> pa.Table:
    """First-significant-digit distribution of positive cent amounts —
    the Benford's-law fraud screen.  Pure per-batch partials (≤ 9 rows
    each cross the exchange), digit taken from the decimal string so
    there is no float log10 boundary case; tiny 9-key fold."""
    ds = _read(sf_dir, "events", ["value"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t.column("value"))
        c = c.filter(pc.greater(c, 0))
        digit = pc.utf8_slice_codeunits(
            pc.cast(c, pa.string()), start=0, stop=1
        ).cast(pa.int64())
        return (
            pa.table({"digit": digit})
            .group_by("digit")
            .aggregate([("digit", "count")])
            .rename_columns(["digit", "n"])
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    return _from_rows(
        rows, {"digit": pa.int64(), "n": pa.int64()}
    ).sort_by("digit")


ORACLE_BENFORD = """
WITH c AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
)
SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
       count(*) AS n
FROM c WHERE cents > 0 GROUP BY 1 ORDER BY 1
"""


def q_weekday_hour_heatmap(sf_dir: str) -> pa.Table:
    """Activity heatmap cells (day-of-week × hour-of-day, exact
    counts) — the seasonality profile.  Integer µs arithmetic per
    batch (epoch days + 4 ≡ DuckDB's Sunday-0 dayofweek), ≤ 168 rows
    per partial, one tiny fold."""
    ds = _read(sf_dir, "events", ["ts"])

    DAY_US = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        us = (
            t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        days = us // DAY_US
        dow = (days + 4) % 7  # 1970-01-01 was a Thursday; Sunday = 0
        hr = us % DAY_US // 3_600_000_000
        cell = dow * 24 + hr
        cnt = np.bincount(cell.astype(np.int64), minlength=168)
        keep = np.flatnonzero(cnt)
        return pa.table(
            {
                "dow": pa.array(keep // 24, pa.int64()),
                "hr": pa.array(keep % 24, pa.int64()),
                "n_events": pa.array(cnt[keep], pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["dow", "hr"])
        .aggregate(Sum("n_events", alias_name="n_events"))
        .take_all()
    )
    return _from_rows(
        rows, {"dow": pa.int64(), "hr": pa.int64(), "n_events": pa.int64()}
    ).sort_by([("dow", "ascending"), ("hr", "ascending")])


ORACLE_WEEKDAY_HOUR = """
SELECT dayofweek(ts) AS dow, hour(ts) AS hr, count(*) AS n_events
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_autocorr_lag1_value_per_user(sf_dir: str) -> pa.Table:
    """Lag-1 autocorrelation of each user's cent series (ordered by
    ts, event_id) — 'does this user's next amount look like the
    last'.  The ordered-pair twin of q_corr_value_ts_per_user: pairs
    (cᵢ, cᵢ₊₁) never cross users, their five moments are exact
    BIGINTs folded through one keyed exchange, and the Pearson tail is
    mirrored token-for-token in the oracle."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        us = (
            g.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        uid, cents = uid[order], cents[order]
        starts = segment_starts(uid)
        start_idx = np.flatnonzero(starts)
        end_idx = np.append(start_idx[1:], len(uid)) - 1
        a = cents.copy()
        b = np.empty_like(cents)
        b[:-1] = cents[1:]
        b[-1] = 0
        # zero the user-boundary rows out of every pair moment
        pair = np.ones(len(uid), dtype=np.int64)
        pair[end_idx] = 0
        a, b = a * pair, b * pair
        npairs = np.add.reduceat(pair, start_idx)
        sa = np.add.reduceat(a, start_idx)
        sb = np.add.reduceat(b, start_idx)
        saa = np.add.reduceat(a * a, start_idx)
        sbb = np.add.reduceat(b * b, start_idx)
        sab = np.add.reduceat(a * b, start_idx)
        n = npairs.astype(np.float64)
        saf, sbf = sa.astype(np.float64), sb.astype(np.float64)
        saaf, sbbf = saa.astype(np.float64), sbb.astype(np.float64)
        sabf = sab.astype(np.float64)
        den = np.sqrt(n * saaf - saf * saf) * np.sqrt(n * sbbf - sbf * sbf)
        with np.errstate(divide="ignore", invalid="ignore"):
            r = (n * sabf - saf * sbf) / den
        t = pa.table(
            {
                "user_id": pa.array(uid[start_idx], pa.int64()),
                "n_pairs": pa.array(npairs, pa.int64()),
                "autocorr_lag1": pa.Array.from_pandas(
                    np.where(den == 0.0, np.nan, r)
                ).cast(pa.float64()),
            }
        )
        return t.filter(pc.greater_equal(t.column("n_pairs"), 2))

    return keyed_window(ds, "user_id", fold).sort("user_id")


ORACLE_AUTOCORR = """
WITH c AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
l AS (
  SELECT user_id, cents AS a,
         lead(cents) OVER (
             PARTITION BY user_id ORDER BY us, event_id) AS b
  FROM c
),
p AS (SELECT user_id, a, b FROM l WHERE b IS NOT NULL),
s AS (
  SELECT user_id, count(*) AS n_pairs,
         CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
         CAST(sum(a * a) AS BIGINT) AS saa,
         CAST(sum(b * b) AS BIGINT) AS sbb,
         CAST(sum(a * b) AS BIGINT) AS sab
  FROM p GROUP BY user_id
)
SELECT user_id, n_pairs,
       CASE WHEN sqrt(CAST(n_pairs AS DOUBLE) * CAST(saa AS DOUBLE)
                      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                 * sqrt(CAST(n_pairs AS DOUBLE) * CAST(sbb AS DOUBLE)
                        - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) = 0
            THEN NULL
            ELSE (CAST(n_pairs AS DOUBLE) * CAST(sab AS DOUBLE)
                  - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                 / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(saa AS DOUBLE)
                         - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                    * sqrt(CAST(n_pairs AS DOUBLE) * CAST(sbb AS DOUBLE)
                           - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
       END AS autocorr_lag1
FROM s WHERE n_pairs >= 2
ORDER BY user_id
"""


def q_type_streaks_per_user(sf_dir: str) -> pa.Table:
    """Gaps-and-islands: per user the number of consecutive-same-type
    streaks and the longest streak (ordered by ts, event_id).  One
    keyed exchange; run-length encoding is two boolean diffs and two
    reduceats — the vectorized twin of SQL's double-row_number
    grouping trick."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        typ = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        us = (
            g.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((eid, us, uid))
        uid, typ = uid[order], typ[order]
        user_start = segment_starts(uid)
        run_start = user_start.copy()
        run_start[1:] |= typ[1:] != typ[:-1]
        run_idx = np.flatnonzero(run_start)
        run_len = np.diff(np.append(run_idx, len(uid)))
        run_uid = uid[run_idx]
        ustart = np.flatnonzero(segment_starts(run_uid))
        return pa.table(
            {
                "user_id": pa.array(run_uid[ustart], pa.int64()),
                "n_streaks": pa.array(
                    np.diff(np.append(ustart, len(run_uid))), pa.int64()
                ),
                "max_streak": pa.array(
                    np.maximum.reduceat(run_len, ustart), pa.int64()
                ),
            }
        )

    return keyed_window(ds, "user_id", fold).sort("user_id")


ORACLE_STREAKS = """
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (
             PARTITION BY user_id ORDER BY ts, event_id)
         - row_number() OVER (
             PARTITION BY user_id, event_type ORDER BY ts, event_id)
           AS grp
  FROM events
),
r AS (
  SELECT user_id, count(*) AS len
  FROM o GROUP BY user_id, event_type, grp
)
SELECT user_id, count(*) AS n_streaks, max(len) AS max_streak
FROM r GROUP BY user_id ORDER BY user_id
"""


