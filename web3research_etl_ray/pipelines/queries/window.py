"""Keyed window functions + pivot/unpivot reshape.

Split from the monolithic queries.py (VERDICT r04 Next #7); the
source text of every operator is unchanged — only module boundaries
and explicit imports were added.  Registered in ``queries._registry``.
"""

from ._shared import (  # noqa: F401
    Max,
    Min,
    Sum,
    _cents,
    _from_rows,
    _read,
    np,
    pa,
    pc,
    ray,
)

# ---------------------------------------------------------------------------
# 8. Keyed window functions (lag / running totals / ranking)
# ---------------------------------------------------------------------------


def _window_sorted(g: pa.Table):
    """Common prep: bucket sorted key-major by (user_id, ts, event_id);
    returns (uid, ts, eid, cents, starts) numpy views."""
    from ...functions.window import segment_starts

    uid = g.column("user_id").to_numpy(zero_copy_only=False)
    ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    eid = g.column("event_id").to_numpy(zero_copy_only=False)
    cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts, uid))
    uid, ts, eid, cents = uid[order], ts[order], eid[order], cents[order]
    return uid, ts, eid, cents, segment_starts(uid)


def q_window_lag_value(sf_dir: str) -> pa.Table:
    """lag(1) per user ordered by (ts, event_id): previous event id and
    value, NULL at each user's first event.  One vectorized shift per
    bucket — no per-user grouping."""
    from ...functions.window import keyed_window, lag_one

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid, ts, eid, cents, starts = _window_sorted(g)
        prev_eid, valid = lag_one(eid, starts)
        prev_cents, _ = lag_one(cents, starts)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "prev_event_id": pa.array(prev_eid, pa.int64(), mask=~valid),
                "prev_cents": pa.array(prev_cents, pa.int64(), mask=~valid),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_WINDOW_LAG = """
SELECT event_id, user_id,
       CAST(ROUND(value * 100) AS BIGINT) AS cents,
       lag(event_id) OVER w AS prev_event_id,
       lag(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS prev_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_window_running_totals(sf_dir: str) -> pa.Table:
    """Running row count + running value sum per user ordered by
    (ts, event_id) — global cumsum rebased per segment (one pass per
    bucket, zero per-key work)."""
    from ...functions.window import keyed_window, row_numbers, running_sum

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid, ts, eid, cents, starts = _window_sorted(g)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "rn": pa.array(row_numbers(starts), pa.int64()),
                "run_cents": pa.array(running_sum(cents, starts), pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_WINDOW_RUN = """
SELECT event_id, user_id,
       row_number() OVER w AS rn,
       CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) AS run_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_window_dense_rank(sf_dir: str) -> pa.Table:
    """dense_rank of value (cents, descending) per user — ties share a
    rank, computed from a within-segment change mask over the whole
    bucket at once."""
    from ...functions.window import dense_ranks, keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, -cents, uid))
        uid, eid, cents = uid[order], eid[order], cents[order]
        starts = segment_starts(uid)
        change = np.zeros(len(cents), dtype=bool)
        change[1:] = cents[1:] != cents[:-1]
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "drank": pa.array(dense_ranks(change, starts), pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_WINDOW_RANK = """
SELECT event_id, user_id,
       dense_rank() OVER (PARTITION BY user_id
                          ORDER BY CAST(ROUND(value * 100) AS BIGINT) DESC) AS drank
FROM events
"""


def q_window_lead_moving(sf_dir: str) -> pa.Table:
    """lead(1) plus a 3-row trailing moving sum per user ordered by
    (ts, event_id) — both from the same single vectorized segment
    pass."""
    from ...functions.window import keyed_window, lead_one, moving_sum

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid, ts, eid, cents, starts = _window_sorted(g)
        next_eid, valid = lead_one(eid, starts)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "next_event_id": pa.array(next_eid, pa.int64(), mask=~valid),
                "mov3_cents": pa.array(moving_sum(cents, starts, 3), pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_WINDOW_LEAD = """
SELECT event_id, user_id,
       lead(event_id) OVER w AS next_event_id,
       CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov3_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_window_rank_tiles(sf_dir: str) -> pa.Table:
    """ntile(4) + first/last event per user (ordered by ts, event_id)
    plus SQL rank() and percent_rank() over cents — the full ranking
    family from the same bucket exchange and segment machinery."""
    from ...functions.window import (
        first_last, keyed_window, min_ranks, ntiles, segment_sizes,
        segment_starts)

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid, ts, eid, cents, starts = _window_sorted(g)
        tile4 = ntiles(4, starts)
        first_eid, last_eid = first_last(eid, starts)
        # rank family is ordered by cents (ties real), not arrival
        order2 = np.lexsort((eid, cents, uid))
        uid2, eid2, cents2 = uid[order2], eid[order2], cents[order2]
        starts2 = segment_starts(uid2)
        change2 = np.zeros(len(cents2), dtype=bool)
        change2[1:] = cents2[1:] != cents2[:-1]
        rank2 = min_ranks(change2, starts2)
        size2 = segment_sizes(starts2)
        prank2 = np.where(size2 > 1, (rank2 - 1) / np.maximum(size2 - 1, 1), 0.0)
        # scatter the cents-ordered outputs back to the ts-ordered
        # layout (ranks are tie-shared, so any tie order agrees)
        rank_ts = np.empty_like(rank2)
        prank_ts = np.empty(len(prank2))
        rank_ts[order2] = rank2
        prank_ts[order2] = prank2
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "tile4": pa.array(tile4, pa.int64()),
                "first_eid": pa.array(first_eid, pa.int64()),
                "last_eid": pa.array(last_eid, pa.int64()),
                "cents_rank": pa.array(rank_ts, pa.int64()),
                "cents_prank": pa.array(prank_ts, pa.float64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


def q_median_value_per_user(sf_dir: str) -> pa.Table:
    """EXACT per-user median (interpolated): the keyed bucket exchange
    co-locates each user's rows, then one vectorized gather per bucket
    takes the middle elements of every sorted segment at once — exact
    order statistics without a per-key sort loop, the complement of the
    approximate bottom-k quantile sketch."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        order = np.lexsort((cents, uid))
        uid, cents = uid[order], cents[order]
        starts = segment_starts(uid)
        start_idx = np.flatnonzero(starts)
        counts = np.diff(np.append(start_idx, len(uid)))
        lo = start_idx + (counts - 1) // 2
        hi = start_idx + counts // 2
        med = (cents[lo] + cents[hi]) / 2.0
        return pa.table(
            {
                "user_id": pa.array(uid[start_idx], pa.int64()),
                "med_cents": pa.array(med, pa.float64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_MEDIAN = """
SELECT user_id,
       median(CAST(ROUND(value * 100) AS BIGINT)) AS med_cents
FROM events GROUP BY user_id
"""


def q_quantiles_value_per_user(sf_dir: str) -> pa.Table:
    """EXACT per-user discrete quantiles (p25/p50/p75): same keyed
    bucket exchange as the median, one lexsort per bucket, then a
    single gather per quantile at index ceil(q*n)-1 of each sorted
    segment — DuckDB ``quantile_disc`` semantics (verified on n=4..7).
    Integer order statistics, so oracle parity is exact (no float
    interpolation)."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        order = np.lexsort((cents, uid))
        uid, cents = uid[order], cents[order]
        start_idx = np.flatnonzero(segment_starts(uid))
        counts = np.diff(np.append(start_idx, len(uid)))
        cols = {"user_id": pa.array(uid[start_idx], pa.int64())}
        for q, nm in ((0.25, "p25_cents"), (0.5, "p50_cents"),
                      (0.75, "p75_cents")):
            # q is an exact binary fraction -> ceil(q*n) is exact
            idx = np.ceil(q * counts).astype(np.int64) - 1
            cols[nm] = pa.array(cents[start_idx + idx], pa.int64())
        return pa.table(cols)

    return keyed_window(ds, "user_id", fn)


ORACLE_QUANTILES = """
SELECT user_id,
       quantile_disc(CAST(ROUND(value * 100) AS BIGINT), 0.25) AS p25_cents,
       quantile_disc(CAST(ROUND(value * 100) AS BIGINT), 0.50) AS p50_cents,
       quantile_disc(CAST(ROUND(value * 100) AS BIGINT), 0.75) AS p75_cents
FROM events GROUP BY user_id
"""


def q_profile_events(sf_dir: str) -> pa.Table:
    """One-pass table profile (the data-quality intake scan a 100 TB
    ingest runs first): per numeric column, row count, null count,
    min, max — one partial row per (column, batch), tiny final fold.
    Long/narrow output shape so adding columns never changes the
    schema."""
    cols = ["event_id", "user_id", "value"]
    ds = _read(sf_dir, "events", cols)

    def partial(t: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs = [], [], [], [], []
        for c in cols:
            col = t.column(c)
            if c == "value":
                col = _cents(col)
            names.append(c)
            ns.append(t.num_rows)
            nulls.append(col.null_count)
            mins.append(pc.min(col).as_py())
            maxs.append(pc.max(col).as_py())
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
                "min_v": pa.array(mins, pa.int64()),
                "max_v": pa.array(maxs, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("column")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_null", alias_name="n_null"),
            Min("min_v", alias_name="min_v"),
            Max("max_v", alias_name="max_v"),
        )
    )


ORACLE_PROFILE = """
SELECT 'event_id' AS "column", count(*) AS n,
       count(*) - count(event_id) AS n_null,
       min(event_id) AS min_v, max(event_id) AS max_v FROM events
UNION ALL
SELECT 'user_id', count(*), count(*) - count(user_id),
       min(user_id), max(user_id) FROM events
UNION ALL
SELECT 'value', count(*), count(*) - count(value),
       min(CAST(ROUND(value * 100) AS BIGINT)),
       max(CAST(ROUND(value * 100) AS BIGINT)) FROM events
"""


def q_funnel_click_purchase(sf_dir: str) -> pa.Table:
    """Conversion funnel: purchases preceded by a click from the same
    user within the trailing hour.  One keyed exchange; inside the
    bucket the per-segment 'last click so far' is ONE
    maximum-accumulate over segment-offset-encoded click times (the
    offset trick keeps the accumulation from crossing segments), then
    a vectorized window test — no per-user loop, no self-join."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "event_id", "event_type", "ts"])
    WINDOW_US = 3_600 * 1_000_000

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid_s, eid_s, ts_s, et_s = (
            uid[order], eid[order], ts[order], et[order]
        )
        seg = np.cumsum(segment_starts(uid_s)) - 1
        # segment-offset encoding: accumulation cannot cross segments
        span = np.int64(ts_s.max() - ts_s.min() + 2) if len(ts_s) else np.int64(2)
        base = ts_s - (ts_s.min() if len(ts_s) else 0)
        click_v = np.where(et_s == "click", base, np.int64(-1)) + seg * span
        last_click = np.maximum.accumulate(click_v) - seg * span
        keep = (
            (et_s == "purchase")
            & (last_click >= 0)
            & (base - last_click <= WINDOW_US)
        )
        return pa.table(
            {
                "user_id": pa.array(uid_s[keep], pa.int64()),
                "event_id": pa.array(eid_s[keep], pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_FUNNEL = """
SELECT user_id, event_id FROM (
  SELECT user_id, event_id, event_type, ts,
         max(CASE WHEN event_type = 'click' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS last_click
  FROM events
)
WHERE event_type = 'purchase'
  AND last_click IS NOT NULL
  AND ts - last_click <= INTERVAL 1 HOUR
"""


def q_outlier_events_per_user(sf_dir: str) -> pa.Table:
    """Grouped anomaly filter: events whose value exceeds the user's
    mean + 2σ (sample std).  ONE keyed exchange — each bucket holds
    all of a user's rows, so moments and flags are a single vectorized
    segment pass; both sides derive the float threshold from the SAME
    exact integer moments with the SAME expression, so the comparison
    is bit-reproducible (no summation-order drift)."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "event_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        order = np.lexsort((cents, uid))
        uid_s, cents_s = uid[order], cents[order]
        starts = np.flatnonzero(segment_starts(uid_s))
        counts = np.diff(np.append(starts, len(uid_s)))
        s = np.add.reduceat(cents_s, starts).astype(np.float64)
        ss = np.add.reduceat(cents_s * cents_s, starts).astype(np.float64)
        n = counts.astype(np.float64)
        with np.errstate(invalid="ignore"):
            thr = s / n + 2.0 * np.sqrt((ss - s * s / n) / (n - 1.0))
        seg = np.repeat(np.arange(len(starts)), counts)
        keep = (counts[seg] >= 2) & (cents_s.astype(np.float64) > thr[seg])
        sel = order[keep]
        return pa.table(
            {
                "user_id": pa.array(uid[sel], pa.int64()),
                "event_id": g.column("event_id").take(
                    pa.array(sel, pa.int64())
                ).cast(pa.int64()),
                "value_cents": pa.array(cents[sel], pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_OUTLIER = """
WITH c AS (
  SELECT user_id, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
m AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(cents) AS DOUBLE) AS s,
         CAST(sum(cents * cents) AS DOUBLE) AS ss
  FROM c GROUP BY user_id
)
SELECT c.user_id, c.event_id, c.cents AS value_cents
FROM c JOIN m USING (user_id)
WHERE m.n >= 2
  AND CAST(c.cents AS DOUBLE) >
      m.s / m.n + 2.0 * sqrt((m.ss - m.s * m.s / m.n) / (m.n - 1.0))
"""


def q_mode_type_per_user(sf_dir: str) -> pa.Table:
    """EXACT grouped mode with a deterministic tie-break (highest
    count, then lexicographically smallest value): per-batch partial
    (key, val, count) — the shuffle moves one row per distinct pair
    per batch, never events — then groupby-sum, then a keyed bucket
    exchange over the |distinct pairs| rows picks each key's argmax
    with one lexsort + segment-first gather."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["user_id", "event_type"])
            .aggregate([("event_type", "count")])
            .rename_columns(["user_id", "event_type", "n"])
        )

    counted = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    # ONE hash-bucket exchange on user: combine the per-batch partial
    # counts AND pick the argmax inside the bucket (Ray's sort-based
    # two-key groupby on the partials measured ~10x slower at 20M rows)
    def pick(g: pa.Table) -> pa.Table:
        uid, codes, tot, vocab = _fold_pair_counts(g)
        # lexsort keys are last-key-major: uid asc, then count desc,
        # then event_type asc for the tie-break
        order = np.lexsort((codes, -tot, uid))
        uid_s = uid[order]
        start_idx = np.flatnonzero(segment_starts(uid_s))
        first = order[start_idx]
        return pa.table(
            {
                "user_id": pa.array(uid[first], pa.int64()),
                "mode_type": vocab.take(pa.array(codes[first], pa.int64())),
                "n": pa.array(tot[first], pa.int64()),
            }
        )

    return keyed_window(counted, "user_id", pick)


def _fold_pair_counts(g: pa.Table):
    """Combine per-batch (user_id, event_type, n) partials inside one
    bucket: composite-key sort + reduceat — returns (uid, type_code,
    total, vocab) over the DISTINCT (user, type) pairs."""
    from ...functions.window import segment_starts

    uid = g.column("user_id").to_numpy(zero_copy_only=False)
    n = g.column("n").to_numpy(zero_copy_only=False)
    et = g.column("event_type").combine_chunks()
    vocab = pa.array(sorted(pc.unique(et).to_pylist()))
    codes = pc.index_in(et, value_set=vocab).to_numpy(zero_copy_only=False)
    V = np.int64(len(vocab))
    key = uid * V + codes
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    starts = np.flatnonzero(segment_starts(key_s))
    tot = (
        np.add.reduceat(n[order], starts)
        if len(key_s)
        else np.zeros(0, np.int64)
    )
    dk = key_s[starts] if len(key_s) else key_s
    return dk // V, (dk % V).astype(np.int64), tot, vocab


ORACLE_MODE = """
SELECT user_id, event_type AS mode_type, n FROM (
  SELECT user_id, event_type, count(*) AS n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
"""


def q_topk_types_per_user(sf_dir: str) -> pa.Table:
    """Per-key top-k most-frequent values (k=2) — the grouped
    heavy-hitters companion of the mode: same partial-count →
    groupby-sum → keyed exchange shape, emitting each segment's first
    k rows of the (count desc, value asc) order with their rank."""
    from ...functions.window import keyed_window, segment_starts

    K = 2
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["user_id", "event_type"])
            .aggregate([("event_type", "count")])
            .rename_columns(["user_id", "event_type", "n"])
        )

    counted = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def pick(g: pa.Table) -> pa.Table:
        uid, codes, tot, vocab = _fold_pair_counts(g)
        order = np.lexsort((codes, -tot, uid))
        uid_s = uid[order]
        start_idx = np.flatnonzero(segment_starts(uid_s))
        # rank within each segment, keep rank <= K
        rank = np.arange(len(uid_s)) - np.repeat(
            start_idx, np.diff(np.append(start_idx, len(uid_s)))
        ) + 1
        keep = rank <= K
        sel = order[keep]
        return pa.table(
            {
                "user_id": pa.array(uid[sel], pa.int64()),
                "event_type": vocab.take(pa.array(codes[sel], pa.int64())),
                "n": pa.array(tot[sel], pa.int64()),
                "rnk": pa.array(rank[keep], pa.int64()),
            }
        )

    return keyed_window(counted, "user_id", pick)


ORACLE_TOPK_TYPES = """
SELECT user_id, event_type, n, rnk FROM (
  SELECT user_id, event_type, count(*) AS n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type) AS rnk
  FROM events GROUP BY user_id, event_type
) WHERE rnk <= 2
"""


def q_string_agg_per_user(sf_dir: str) -> pa.Table:
    """Grouped ordered string aggregation (ClickHouse groupArray /
    SQL string_agg ... ORDER BY): bucket exchange co-locates each
    user's rows, one lexsort by (user, event_id) per bucket, then ONE
    vectorized ``pc.binary_join`` over a ListArray built straight from
    the segment offsets — no per-key Python loop, no pandas.  The
    deterministic ORDER BY (unique event_id) makes the concatenation
    reproducible and oracle-exact."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "event_id", "event_type"])

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, uid))
        uid = uid[order]
        types = g.column("event_type").combine_chunks().take(
            pa.array(order, pa.int64())
        )
        start_idx = np.flatnonzero(segment_starts(uid))
        offsets = np.append(start_idx, len(uid)).astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(offsets), types)
        return pa.table(
            {
                "user_id": pa.array(uid[start_idx], pa.int64()),
                "types_csv": pc.binary_join(lst, ","),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_STRING_AGG = """
SELECT user_id,
       string_agg(event_type, ',' ORDER BY event_id) AS types_csv
FROM events GROUP BY user_id
"""


def q_moments_value_per_user(sf_dir: str) -> pa.Table:
    """Distributed second-moment statistics with EXACT integer
    arithmetic: per-batch partial (n, sum, sum-of-squares) over cents
    — fully associative, so the shuffle moves one row per (user,
    batch), not the events — then a tiny groupby-sum.  Variance /
    stddev derive from these moments identically on both sides; the
    engine ships the exact BIGINT moments so parity is bit-exact (no
    float summation-order drift)."""
    ds = _read(sf_dir, "events", ["user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        cents = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid, cents = uid[order], cents[order]
        keys, starts = np.unique(uid, return_index=True)
        n = np.diff(np.append(starts, len(uid)))
        csum = np.add.reduceat(cents, starts)
        sqsum = np.add.reduceat(cents * cents, starts)
        return pa.table(
            {
                "user_id": pa.array(keys, pa.int64()),
                "n_events": pa.array(n, pa.int64()),
                "sum_cents": pa.array(csum, pa.int64()),
                "sumsq_cents": pa.array(sqsum, pa.int64()),
            }
        )

    from ...functions.window import keyed_window, segment_starts

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    # final fold through the hash-bucket exchange: Ray's sort-based
    # groupby on the partial rows measured 6x slower at 20M events
    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid = uid[order]
        starts = np.flatnonzero(segment_starts(uid))
        cols = {"user_id": pa.array(uid[starts], pa.int64())}
        for c in ("n_events", "sum_cents", "sumsq_cents"):
            v = g.column(c).to_numpy(zero_copy_only=False)[order]
            cols[c] = pa.array(np.add.reduceat(v, starts), pa.int64())
        return pa.table(cols)

    return keyed_window(partials, "user_id", fold)


ORACLE_MOMENTS = """
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(sum(CAST(ROUND(value * 100) AS BIGINT)
                * CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
         AS sumsq_cents
FROM events GROUP BY user_id
"""


def q_corr_value_ts_per_user(sf_dir: str) -> pa.Table:
    """Grouped Pearson correlation of (time, value) per user — the
    'is this user's spend trending' primitive — with EXACT integer
    moments: x = whole minutes since the global min ts, y = cents.
    Per-batch partials ship (n, Σx, Σy, Σx², Σy², Σxy) as BIGINTs —
    associative, one row per (user, batch) crosses the exchange —
    then the keyed hash-bucket fold sums them and the corr derives in
    float64 with an expression tree mirrored token-for-token in the
    oracle, so even the floats are bit-identical."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    # pass 1: global min ts (one scalar; the oracle's subquery twin)
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
        for name, v in (
            ("sx", x), ("sy", y), ("sxx", x * x), ("syy", y * y),
            ("sxy", x * y),
        ):
            cols[name] = pa.array(np.add.reduceat(v, starts), pa.int64())
        return pa.table(cols)

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid = uid[order]
        starts = np.flatnonzero(segment_starts(uid))
        cols = {"user_id": pa.array(uid[starts], pa.int64())}
        acc = {}
        for c in ("n_events", "sx", "sy", "sxx", "syy", "sxy"):
            v = g.column(c).to_numpy(zero_copy_only=False)[order]
            acc[c] = np.add.reduceat(v, starts)
        # float64 tail, op order mirrored in ORACLE_CORR exactly
        n = acc["n_events"].astype(np.float64)
        sx, sy = acc["sx"].astype(np.float64), acc["sy"].astype(np.float64)
        sxx, syy = acc["sxx"].astype(np.float64), acc["syy"].astype(np.float64)
        sxy = acc["sxy"].astype(np.float64)
        cov = n * sxy - sx * sy
        den = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = cov / den
        cols["n_events"] = pa.array(acc["n_events"], pa.int64())
        # zero-variance groups are NULL (matches the oracle's CASE)
        cols["corr_ts_value"] = pa.Array.from_pandas(
            np.where(den == 0.0, np.nan, corr)
        ).cast(pa.float64())
        t = pa.table(cols)
        return t.filter(pc.greater_equal(t.column("n_events"), 2))

    return keyed_window(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "user_id",
        fold,
    ).sort("user_id")


ORACLE_CORR = """
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
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM b GROUP BY user_id
)
SELECT user_id, n_events,
       CASE WHEN sqrt(CAST(n_events AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * sqrt(CAST(n_events AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0
            THEN NULL
            ELSE (CAST(n_events AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n_events AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n_events AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       END AS corr_ts_value
FROM s WHERE n_events >= 2
ORDER BY user_id
"""


def q_histogram_value(sf_dir: str) -> pa.Table:
    """Equi-width histogram of event values over the observed [min,
    max] cents range, NBINS=20 — exact integer bin edges so the oracle
    mirrors bit-for-bit.  Distributed: one tiny min/max aggregate,
    then per-batch bincount partials (each batch ships <= NBINS rows)
    folded by a 20-key groupby-sum."""
    NBINS = 20
    ds = _read(sf_dir, "events", ["value"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({"c": _cents(t.column("value"))})

    cents = ds.map_batches(
        to_cents, batch_format="pyarrow", zero_copy_batch=True
    )
    mm = cents.aggregate(Min("c"), Max("c"))
    lo, hi = int(mm["min(c)"]), int(mm["max(c)"])
    width = int(np.ceil((hi - lo + 1) / float(NBINS)))

    def partial(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False)
        b = (c - lo) // width
        counts = np.bincount(b, minlength=NBINS)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "bin": pa.array(nz, pa.int64()),
                "n": pa.array(counts[nz], pa.int64()),
            }
        )

    rows = (
        cents.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    t = _from_rows(rows, {"bin": pa.int64(), "n": pa.int64()})
    t = t.append_column(
        "lo_cents",
        pc.add(pc.multiply(t.column("bin"), pa.scalar(width, pa.int64())),
               pa.scalar(lo, pa.int64())),
    )
    return t.select(["bin", "lo_cents", "n"]).sort_by([("bin", "ascending")])


ORACLE_HISTOGRAM = """
WITH b AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
mm AS (SELECT min(c) AS lo, max(c) AS hi FROM b),
w AS (SELECT lo, CAST(ceil((hi - lo + 1) / 20.0) AS BIGINT) AS width FROM mm)
SELECT (c - lo) // width AS bin,
       lo + ((c - lo) // width) * width AS lo_cents,
       count(*) AS n
FROM b, w
GROUP BY 1, 2
ORDER BY bin
"""


ORACLE_WINDOW_TILES = """
SELECT event_id, user_id,
       ntile(4) OVER w AS tile4,
       first_value(event_id) OVER w AS first_eid,
       last_value(event_id) OVER
         (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_eid,
       rank() OVER r AS cents_rank,
       percent_rank() OVER r AS cents_prank
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       r AS (PARTITION BY user_id
             ORDER BY CAST(ROUND(value * 100) AS BIGINT))
"""


# ---------------------------------------------------------------------------
# 9. Reshape: pivot / unpivot
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def q_pivot_event_counts(sf_dir: str) -> pa.Table:
    """Long→wide: per-user occurrence counts of each event type as
    columns.  Batch-local partial pivot (mask bincounts) → tiny
    groupby-sum; the shuffle moves wide partials, not events."""
    from ...functions.reshape import pivot_counts

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return pivot_counts(ds, "user_id", "event_type", _EVENT_TYPES)


ORACLE_PIVOT = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')    AS n_click,
       count(*) FILTER (WHERE event_type = 'view')     AS n_view,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       count(*) FILTER (WHERE event_type = 'error')    AS n_error
FROM events GROUP BY user_id
"""


def q_unpivot_event_counts(sf_dir: str) -> pa.Table:
    """Wide→long round-trip: melt the pivoted per-user counts back to
    (user_id, event_type, n) rows — zero-shuffle batch-local melt."""
    from ...functions.reshape import pivot_counts, unpivot

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    wide = pivot_counts(ds, "user_id", "event_type", _EVENT_TYPES)
    return unpivot(
        wide,
        ["user_id"],
        ["n_" + c for c in _EVENT_TYPES],
        var_name="event_type",
        value_name="n",
    )


ORACLE_UNPIVOT = """
WITH w AS ({pivot})
SELECT user_id, 'n_' || t AS event_type,
       CASE t WHEN 'click' THEN n_click WHEN 'view' THEN n_view
              WHEN 'purchase' THEN n_purchase WHEN 'signup' THEN n_signup
              ELSE n_error END AS n
FROM w, unnest(['click','view','purchase','signup','error']) AS u(t)
""".format(pivot=ORACLE_PIVOT)


def q_rollup_event_counts(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP(event_type, user_id): counts at every prefix
    grouping, NULLs in rolled-up columns.  One distributed pass builds
    the finest level; coarser levels fold the (already tiny) previous
    level."""
    from ...functions.reshape import rollup_counts

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return rollup_counts(ds, ["event_type", "user_id"], "n")


ORACLE_ROLLUP = """
SELECT event_type, user_id, count(*) AS n
FROM events GROUP BY ROLLUP(event_type, user_id)
"""


def q_cube_event_counts(sf_dir: str) -> pa.Table:
    """GROUP BY CUBE(event_type, user_id): all 4 grouping sets, each
    derived from the single distributed finest-level aggregation."""
    from ...functions.reshape import cube_counts

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return cube_counts(ds, ["event_type", "user_id"], "n")


ORACLE_CUBE = """
SELECT event_type, user_id, count(*) AS n
FROM events GROUP BY CUBE(event_type, user_id)
"""


#: "big purchase" threshold (cents) for the set-op queries — selective
#: enough that INTERSECT and EXCEPT are both non-trivial at every sf
_BIG_PURCHASE_CENTS = 20_000


def _clickers(sf_dir: str) -> ray.data.Dataset:
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "click")).select(
            ["user_id"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _big_purchasers(sf_dir: str) -> ray.data.Dataset:
    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def fn(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(t.column("event_type"), "purchase"),
            pc.greater(_cents(t.column("value")),
                       pa.scalar(_BIG_PURCHASE_CENTS, pa.int64())),
        )
        return t.filter(keep).select(["user_id"])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_intersect_click_purchase(sf_dir: str) -> pa.Table:
    """INTERSECT: users who clicked AND made a big purchase (distinct)
    — per-batch distinct + presence flags, one groupby-max combine."""
    from ...functions.setops import set_intersect

    return set_intersect(_clickers(sf_dir), _big_purchasers(sf_dir),
                         ["user_id"])


_SETOP_SIDES = f"""
SELECT user_id FROM events WHERE event_type = 'click'
{{op}}
SELECT user_id FROM events WHERE event_type = 'purchase'
  AND CAST(ROUND(value * 100) AS BIGINT) > {_BIG_PURCHASE_CENTS}
"""

ORACLE_INTERSECT = _SETOP_SIDES.format(op="INTERSECT")


def q_except_click_no_purchase(sf_dir: str) -> pa.Table:
    """EXCEPT: users who clicked but never made a big purchase."""
    from ...functions.setops import set_except

    return set_except(_clickers(sf_dir), _big_purchasers(sf_dir),
                      ["user_id"])


ORACLE_EXCEPT = _SETOP_SIDES.format(op="EXCEPT")


def q_heavy_hitter_users(sf_dir: str) -> pa.Table:
    """Users with ≥0.5% of all events, with EXACT counts, found via a
    Misra–Gries candidate sketch (shuffle moves ≤k rows per batch, not
    the distinct-user domain) + a broadcast-candidate exact recount —
    the 10^10-scale heavy-hitter pattern with an exact SQL oracle."""
    from ...functions.sketch import heavy_hitters

    ds = _read(sf_dir, "events", ["user_id"])
    return heavy_hitters(ds, "user_id", k=256, min_share=0.005)


ORACLE_HEAVY = """
SELECT user_id, count(*) AS n FROM events GROUP BY user_id
HAVING count(*) >= CAST(ceil(0.005 * (SELECT count(*) FROM events)) AS BIGINT)
"""


