"""Code-corpus preprocessing, Gopher repetition, SCD2 interval joins.

Split from the monolithic queries.py (VERDICT r04 Next #7); the
source text of every operator is unchanged — only module boundaries
and explicit imports were added.  Registered in ``queries._registry``.
"""

from ._shared import (  # noqa: F401
    Count,
    Max,
    Min,
    Sum,
    _cents,
    _from_rows,
    _micro,
    _read,
    key_hash64,
    np,
    os,
    pa,
    pc,
    ray,
)
from .cdc import (  # noqa: F401
    _EV_CTE,
    _ORPHAN_HI,
    _ORPHAN_LO,
    _derive_cdc_stream,
)
from .text import (  # noqa: F401
    _exact_jaccard_pairs_ds,
)
from .window import (  # noqa: F401
    _window_sorted,
)

# ---------------------------------------------------------------------------
# wave 17: Gopher repetition rules + point-in-time interval probe
# ---------------------------------------------------------------------------

def q_gopher_repetition_documents(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style within-document repetition filters (Rae et al.
    2021 §A1.1, public paper): per doc, the count of its most frequent
    unigram (``top_unigram_n`` — the paper's "fraction of characters
    in the most common n-gram" rule, a doc dominated by one token is
    boilerplate) and the number of duplicated word BIGRAMS
    (``n_dup_bigrams`` = total − distinct — the duplicate-2-gram rule;
    `repetition_stats_documents` covers the sibling 4-gram rule of the
    same published rule set, and `gopher_quality_documents` the
    non-repetition rules).  All-integer output so the parity hash is
    exact; the ratios a filter would threshold are
    numerator/denominator of these columns.

    Distributed shape: embarrassingly parallel — each doc's text is
    one row, so every statistic completes inside its batch; NO
    exchange at any scale.  Per-batch math is one tokenize, two Arrow
    group_bys and bincounts — no Python loop over docs."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column("text"), "")),
            pattern=r"\W+",
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ok = pc.greater(pc.utf8_length(flat), 0).to_numpy(
            zero_copy_only=False
        )
        flat = flat.filter(pa.array(ok))
        parent = parent[ok]
        nrows = t.num_rows
        n_tokens = np.bincount(parent, minlength=nrows).astype(np.int64)
        # most-frequent-unigram count per doc
        top_n = np.zeros(nrows, np.int64)
        if len(flat):
            ucnt = (
                pa.table({"p": pa.array(parent, pa.int64()), "tok": flat})
                .group_by(["p", "tok"])
                .aggregate([("tok", "count")])
            )
            pm = ucnt.column("p").to_numpy(zero_copy_only=False)
            cm = ucnt.column("tok_count").to_numpy(zero_copy_only=False)
            np.maximum.at(top_n, pm, cm)
        # bigrams: windows of 2 not crossing doc boundaries
        n_bigrams = np.maximum(n_tokens - 1, 0)
        n_distinct_bg = np.zeros(nrows, np.int64)
        n = len(flat)
        if n >= 2:
            sh = pc.binary_join_element_wise(
                flat.slice(0, n - 1), flat.slice(1, n - 1), " "
            )
            valid = parent[: n - 1] == parent[1:]
            bg = pa.table(
                {"p": pa.array(parent[: n - 1], pa.int64()), "sh": sh}
            ).filter(pa.array(valid))
            if bg.num_rows:
                dist = (
                    bg.group_by(["p", "sh"])
                    .aggregate([])
                    .group_by("p")
                    .aggregate([("sh", "count")])
                )
                pm = dist.column("p").to_numpy(zero_copy_only=False)
                cm = dist.column("sh_count").to_numpy(zero_copy_only=False)
                n_distinct_bg[pm] = cm
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "top_unigram_n": pa.array(top_n, pa.int64()),
                "n_bigrams": pa.array(n_bigrams.astype(np.int64), pa.int64()),
                "n_dup_bigrams": pa.array(
                    (n_bigrams - n_distinct_bg).astype(np.int64), pa.int64()
                ),
            }
        )

    return ds.map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    ).sort("doc_id")


ORACLE_GOPHER_REPETITION = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_extract_all(lower(text), '\w+'),
                     x -> length(x) > 0) AS ts
  FROM documents
), uni AS (
  SELECT doc_id, ts[i] AS tok
  FROM toks JOIN range(1, 4096) t(i) ON t.i <= len(ts)
), ucnt AS (
  SELECT doc_id, tok, count(*) AS c FROM uni GROUP BY 1, 2
), per_doc AS (
  SELECT doc_id, max(c) AS top_unigram_n FROM ucnt GROUP BY 1
), bg AS (
  SELECT doc_id, array_to_string(ts[i:i+1], ' ') AS sh
  FROM toks JOIN range(1, 4096) t(i) ON t.i <= greatest(0, len(ts) - 1)
), bgd AS (
  SELECT doc_id, count(DISTINCT sh) AS n_distinct, count(*) AS n_total
  FROM bg GROUP BY 1
)
SELECT d.doc_id,
       CAST(len(d.ts) AS BIGINT) AS n_tokens,
       CAST(COALESCE(p.top_unigram_n, 0) AS BIGINT) AS top_unigram_n,
       CAST(COALESCE(b.n_total, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(b.n_total - b.n_distinct, 0) AS BIGINT)
         AS n_dup_bigrams
FROM toks d
LEFT JOIN per_doc p USING (doc_id)
LEFT JOIN bgd b USING (doc_id)
ORDER BY doc_id
"""

#: decontamination shingle width (GPT-3 App. C uses 13-gram overlap on
#: real corpora; the synthetic fixture docs are ~30 tokens, so 5 keeps
#: the statistic non-degenerate at every sf)
#: point-in-time probe sequence numbers (spanning both live epochs and
#: the post-stream horizon; the orphaned range sits inside epoch 2)
_PIT_PROBES = (50_000, 150_000, 250_000)


def q_pit_live_versions(sf_dir: str) -> pa.Table:
    """Point-in-time interval probe over the SCD2 history (the
    interval-join company of `scd2_history`): for each probe sequence
    number, how many (repo, path) versions were LIVE at that instant —
    commit_seq ≤ probe < valid_to (open = ∞) and not a delete.  The
    "how many files existed at commit X" audit query.

    Distributed shape: one key-hash bucket exchange builds validity
    intervals (same kernel as scd2_history); each bucket then answers
    ALL probes with vectorized interval tests and emits ≤ |probes|
    partial counts — the driver folds ≤ buckets × probes integers."""
    from ...functions.hashing import key_hash64
    from ...functions.window import lead_one, segment_starts

    import glob as _glob

    stream = _derive_cdc_stream(sf_dir)
    ds = ray.data.read_parquet(
        sorted(_glob.glob(os.path.join(stream, "events-*.parquet"))),
        columns=["repo", "path", "commit_seq", "op"],
    ).map_batches(
        lambda t: t.filter(
            pc.or_(
                pc.less(t.column("commit_seq"), pa.scalar(_ORPHAN_LO)),
                pc.greater(t.column("commit_seq"), pa.scalar(_ORPHAN_HI)),
            )
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def bucketize(t: pa.Table) -> pa.Table:
        h = key_hash64(t.column("repo"), t.column("path"))
        return t.append_column(
            "__b", pa.array((h % np.uint64(32)).astype(np.int64), pa.int64())
        )

    probes = np.asarray(_PIT_PROBES, np.int64)

    def live_counts(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__b"])
        key = pc.binary_join_element_wise(
            g.column("repo"), g.column("path"), "\x00"
        )
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        vocab = pa.array(sorted(pc.unique(key).to_pylist()))
        codes = pc.index_in(key, value_set=vocab).to_numpy(
            zero_copy_only=False
        )
        seq = g.column("commit_seq").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, codes))
        codes_s, seq_s = codes[order], seq[order]
        starts = segment_starts(codes_s)
        led, valid = lead_one(seq_s, starts)
        op = (
            g.column("op").take(pa.array(order, pa.int64()))
            .to_numpy(zero_copy_only=False)
        )
        alive = op != "delete"
        counts = np.empty(len(probes), np.int64)
        for j, s in enumerate(probes):  # |probes| iterations, not rows
            open_or_after = ~valid | (led > s)
            counts[j] = int(np.sum((seq_s <= s) & open_or_after & alive))
        return pa.table(
            {
                "probe_seq": pa.array(probes, pa.int64()),
                "n_live": pa.array(counts, pa.int64()),
            }
        )

    partials = (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(live_counts, batch_format="pyarrow")
    )
    rows = partials.take_all()  # ≤ buckets × probes rows
    acc = {int(s): 0 for s in probes}
    for r in rows:
        acc[int(r["probe_seq"])] += int(r["n_live"])
    return pa.table(
        {
            "probe_seq": pa.array(sorted(acc), pa.int64()),
            "n_live": pa.array(
                [acc[s] for s in sorted(acc)], pa.int64()
            ),
        }
    )


ORACLE_PIT_LIVE = f"""
WITH {_EV_CTE},
v AS (
  SELECT repo, path, commit_seq, op,
         lead(commit_seq) OVER (
           PARTITION BY repo, path ORDER BY commit_seq) AS valid_to_seq
  FROM eff
),
p AS (SELECT CAST(UNNEST([{", ".join(str(s) for s in _PIT_PROBES)}]) AS BIGINT)
        AS probe_seq)
SELECT p.probe_seq,
       CAST(count(*) FILTER (
         WHERE v.commit_seq <= p.probe_seq
           AND (v.valid_to_seq IS NULL OR v.valid_to_seq > p.probe_seq)
           AND v.op <> 'delete'
       ) AS BIGINT) AS n_live
FROM p CROSS JOIN v
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# wave 18: interval-overlap join over SCD2 validity intervals
# ---------------------------------------------------------------------------

def q_concurrent_versions_per_repo(sf_dir: str) -> ray.data.Dataset:
    """Interval-OVERLAP join over the SCD2 validity intervals (the
    interval-join family member `pit_live_versions`' point probe and
    `asof_join_clicks_views`' as-of don't cover): per repo, how many
    PAIRS of live versions (different paths — same-path versions chain
    and never overlap) had intersecting validity windows, plus the
    peak number of simultaneously-live versions.  The concurrent-edit
    / contention audit of a CDC lake.

    Distributed shape: the quadratic overlap join is never
    materialized — one repo-keyed bucket exchange, then TWO classic
    sweeps, both vectorized across ALL repos of the bucket at once by
    lifting (repo_code, seq) into a single composite key space:
    overlap pairs = C(n,2) − disjoint pairs via one global
    searchsorted of starts into sorted ends (half-open intervals make
    each disjoint pair counted exactly once), and peak concurrency =
    max of a per-segment running boundary sum (±1 deltas, ends sorted
    before starts at ties).  O(n log n) per bucket, no per-repo Python
    loop, driver sees one row per repo."""
    from ...functions.window import keyed_window, segment_starts

    import glob as _glob

    stream = _derive_cdc_stream(sf_dir)
    ds = ray.data.read_parquet(
        sorted(_glob.glob(os.path.join(stream, "events-*.parquet"))),
        columns=["repo", "path", "commit_seq", "op"],
    ).map_batches(
        lambda t: t.filter(
            pc.or_(
                pc.less(t.column("commit_seq"), pa.scalar(_ORPHAN_LO)),
                pc.greater(t.column("commit_seq"), pa.scalar(_ORPHAN_HI)),
            )
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    #: composite-key stride: seqs are < 2^22 here; 2^40 keeps every
    #: repo's (start, end) range disjoint in one sortable axis
    B = np.int64(1) << np.int64(40)
    INF = B - np.int64(1)  # open interval: "end of this repo's range"

    def per_bucket(g: pa.Table) -> pa.Table:
        from ...functions.window import lead_one

        empty = pa.table(
            {"repo": pa.array([], pa.string()),
             "n_versions": pa.array([], pa.int64()),
             "n_overlap_pairs": pa.array([], pa.int64()),
             "peak_concurrent": pa.array([], pa.int64())}
        )
        if g.num_rows == 0:
            return empty
        key = pc.binary_join_element_wise(
            g.column("repo"), g.column("path"), "\x00"
        )
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        vocab = pa.array(sorted(pc.unique(key).to_pylist()))
        codes = pc.index_in(key, value_set=vocab).to_numpy(
            zero_copy_only=False
        )
        seq = g.column("commit_seq").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, codes))
        codes_s, seq_s = codes[order], seq[order]
        starts_m = segment_starts(codes_s)
        led, has_next = lead_one(seq_s, starts_m)
        op = (
            g.column("op").take(pa.array(order, pa.int64()))
            .to_numpy(zero_copy_only=False)
        )
        repo = (
            g.column("repo").take(pa.array(order, pa.int64()))
            .combine_chunks()
        )
        live = op != "delete"
        if not live.any():
            return empty
        rvocab = pa.array(sorted(pc.unique(repo).to_pylist()))
        rcode = pc.index_in(repo, value_set=rvocab).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        lo = seq_s[live].astype(np.int64) + rcode[live] * B
        hi = np.where(has_next[live], led[live], INF).astype(np.int64) + (
            rcode[live] * B
        )
        rc = rcode[live]
        n_repos = len(rvocab)
        n_per = np.bincount(rc, minlength=n_repos).astype(np.int64)
        # --- overlap pairs: C(n,2) − disjoint (end_j ≤ start_i) ---
        hi_sorted = np.sort(hi)
        # ends belonging to earlier repos, per interval
        before = np.searchsorted(hi_sorted, rc * B, side="left")
        disjoint_i = np.searchsorted(hi_sorted, lo, side="right") - before
        disjoint = np.bincount(rc, weights=disjoint_i, minlength=n_repos)
        pairs = n_per * (n_per - 1) // 2 - disjoint.astype(np.int64)
        # --- peak concurrency: per-repo running ±1 boundary sum ---
        closed = hi % B != INF
        ev_seq = np.concatenate([lo, hi[closed]])
        ev_d = np.concatenate(
            [np.ones(len(lo), np.int64), -np.ones(int(closed.sum()), np.int64)]
        )
        ev_rc = np.concatenate([rc, rc[closed]])
        eorder = np.lexsort((ev_d, ev_seq))  # ends (−1) before starts at ties
        ev_rc = ev_rc[eorder]
        run = np.cumsum(ev_d[eorder])
        seg = segment_starts(ev_rc)  # composite keys keep repos contiguous
        idx = np.flatnonzero(seg)
        base = np.where(idx > 0, run[idx - 1], 0)
        run = run - np.repeat(base, np.diff(np.append(idx, len(run))))
        peak = np.maximum.reduceat(run, idx).astype(np.int64)
        peak_rc = ev_rc[idx]
        peak_per = np.zeros(n_repos, np.int64)
        peak_per[peak_rc] = peak
        return pa.table(
            {
                "repo": rvocab,
                "n_versions": pa.array(n_per, pa.int64()),
                "n_overlap_pairs": pa.array(pairs, pa.int64()),
                "peak_concurrent": pa.array(peak_per, pa.int64()),
            }
        )

    return keyed_window(ds, "repo", per_bucket).sort("repo")


ORACLE_CONCURRENT_VERSIONS = f"""
WITH {_EV_CTE},
v AS (
  SELECT repo, path, commit_seq, op,
         lead(commit_seq) OVER (
           PARTITION BY repo, path ORDER BY commit_seq) AS valid_to_seq
  FROM eff
),
lv AS (SELECT * FROM v WHERE op <> 'delete'),
pairs AS (
  SELECT a.repo, count(*) AS n_overlap_pairs
  FROM lv a JOIN lv b
    ON a.repo = b.repo AND a.commit_seq < b.commit_seq
   AND (a.valid_to_seq IS NULL OR a.valid_to_seq > b.commit_seq)
  GROUP BY 1
),
bounds AS (
  SELECT repo, commit_seq AS s, 1 AS d FROM lv
  UNION ALL
  SELECT repo, valid_to_seq AS s, -1 AS d FROM lv
  WHERE valid_to_seq IS NOT NULL
),
run AS (
  SELECT repo, sum(d) OVER (
    PARTITION BY repo ORDER BY s, d ROWS UNBOUNDED PRECEDING) AS c
  FROM bounds
),
peak AS (SELECT repo, max(c) AS peak_concurrent FROM run GROUP BY 1),
nv AS (SELECT repo, count(*) AS n_versions FROM lv GROUP BY 1)
SELECT nv.repo,
       CAST(nv.n_versions AS BIGINT) AS n_versions,
       CAST(COALESCE(p.n_overlap_pairs, 0) AS BIGINT) AS n_overlap_pairs,
       CAST(pk.peak_concurrent AS BIGINT) AS peak_concurrent
FROM nv
LEFT JOIN pairs p USING (repo)
JOIN peak pk USING (repo)
ORDER BY repo
"""


def q_window_range_trailing(sf_dir: str) -> ray.data.Dataset:
    """SQL RANGE frame — the TIME-interval window the ROWS-frame
    family (`window_lead_moving`'s mov3) can't express: per event, the
    count and cents-sum of the SAME user's events in the trailing ONE
    HOUR by timestamp (RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND
    CURRENT ROW).  RANGE semantics are matched exactly: the frame ends
    at the current row's last PEER, so equal-ts events of a user see
    each other regardless of tie order (closed-interval searchsorted
    on ts gives precisely that set).

    One keyed bucket exchange; inside the bucket
    ``range_frame_bounds`` answers BOTH frame bounds for every row of
    every user with two global searchsorteds over a per-segment
    offset-lifted time axis (inter-user gaps > window keep probes
    inside their segment; the lift chunks itself on int64 overflow) —
    no per-user loop, and one prefix sum turns bounds into sums."""
    from ...functions.window import keyed_window, range_frame_bounds

    HOUR_US = np.int64(3_600_000_000)
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def fn(g: pa.Table) -> pa.Table:
        uid, ts, eid, cents, starts = _window_sorted(g)
        lo, hi = range_frame_bounds(ts, starts, HOUR_US)
        csum = np.concatenate(([np.int64(0)], np.cumsum(cents)))
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "w1h_n": pa.array(hi - lo, pa.int64()),
                "w1h_sum_cents": pa.array(csum[hi] - csum[lo], pa.int64()),
            }
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_WINDOW_RANGE = """
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS w1h_n,
       CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
         AS w1h_sum_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def q_quantiles_cont_per_user(sf_dir: str) -> ray.data.Dataset:
    """EXACT per-user INTERPOLATED quantiles (SQL ``quantile_cont`` /
    PERCENTILE_CONT p25/p50/p75) — the linear-interpolation complement
    of `quantiles_value_per_user`'s discrete gather.  Float parity is
    made bit-exact by integerizing the interpolation itself: with
    q = k/4, h = q*(n-1) has 4h integer, so 4x the interpolated value
    is the INTEGER c_lo*(4-r) + c_hi*r (r = 4h mod 4) — emitted as
    quarter-cents, and the oracle's quantile_cont(cents)*4 is exact in
    double because every term is a multiple of 0.25 below 2^55.

    Same distributed shape as the discrete path: one keyed bucket
    exchange, one lexsort per bucket, two gathers per quantile."""
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
        for k, nm in ((1, "p25_qc"), (2, "p50_qc"), (3, "p75_qc")):
            h4 = k * (counts - 1)  # 4*(q*(n-1)), exact integer
            r = h4 % 4
            lo = cents[start_idx + h4 // 4]
            hi = cents[start_idx + (h4 + 3) // 4]
            cols[nm] = pa.array(lo * (4 - r) + hi * r, pa.int64())
        return pa.table(cols)

    return keyed_window(ds, "user_id", fn)


ORACLE_QUANTILES_CONT = """
SELECT user_id,
  CAST(ROUND(quantile_cont(CAST(ROUND(value*100) AS BIGINT), 0.25) * 4)
       AS BIGINT) AS p25_qc,
  CAST(ROUND(quantile_cont(CAST(ROUND(value*100) AS BIGINT), 0.50) * 4)
       AS BIGINT) AS p50_qc,
  CAST(ROUND(quantile_cont(CAST(ROUND(value*100) AS BIGINT), 0.75) * 4)
       AS BIGINT) AS p75_qc
FROM events GROUP BY user_id
"""


def q_audience_matrix(sf_dir: str) -> pa.Table:
    """Audience segmentation matrix over HIGH-VALUE interactions
    (value > 200 — the whale-behavior band; the unfiltered matrix is
    degenerate on dense streams where every user touches every type):
    for every ordered event-type pair (done, missing), how many
    distinct users did `done` but NEVER did `missing`.  The
    did-X-not-Y query is the classic self-anti-join trap (|T|^2
    correlated NOT EXISTS subqueries); here it costs ONE user-keyed
    exchange total: each bucket folds its users' distinct types into
    per-user BITMASKS (bitwise_or.reduceat — the
    `cross_source_overlap` kernel), emits (mask, n_users) rows bounded
    by distinct masks <= 2^|T|, and the driver expands the tiny mask
    histogram into the |T|^2 matrix.  Assumes a bounded event-type
    taxonomy (|T| <= 63 — enum-like CDC op/type vocabularies), asserted
    at run time; the global vocabulary comes from a distinct pass so a
    type absent from a bucket still counts as 'never did' there."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"]) \
        .map_batches(
            lambda t: t.filter(
                pc.greater(t.column("value"), pa.scalar(200.0))
            ).select(["user_id", "event_type"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    types = sorted(ds.unique("event_type"))
    if len(types) > 63:
        raise ValueError("audience_matrix assumes |event types| <= 63")
    vocab = pa.array(types, pa.string())

    def fn(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        code = pc.index_in(
            g.column("event_type").combine_chunks(), value_set=vocab
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((code, uid))
        uid, code = uid[order], code[order]
        idx = np.flatnonzero(segment_starts(uid))
        masks = np.bitwise_or.reduceat(np.int64(1) << code, idx)
        um, cnt = np.unique(masks, return_counts=True)
        return pa.table(
            {"mask": pa.array(um, pa.int64()),
             "n": pa.array(cnt, pa.int64())}
        )

    rows = keyed_window(ds, "user_id", fn).take_all()
    agg: dict[int, int] = {}
    for r in rows:  # <= buckets x distinct masks — tiny driver fold
        agg[r["mask"]] = agg.get(r["mask"], 0) + r["n"]
    T = len(types)
    out = np.zeros((T, T), np.int64)
    for mask, n in agg.items():
        done = np.flatnonzero((mask >> np.arange(T)) & 1)
        miss = np.flatnonzero(~(mask >> np.arange(T)) & 1)
        if len(done) and len(miss):
            out[np.repeat(done, len(miss)), np.tile(miss, len(done))] += n
    d, m = np.nonzero(out)
    return pa.table(
        {
            "done_type": pa.array([types[i] for i in d], pa.string()),
            "missing_type": pa.array([types[j] for j in m], pa.string()),
            "n_users": pa.array(out[d, m], pa.int64()),
        }
    ).sort_by([("done_type", "ascending"), ("missing_type", "ascending")])


ORACLE_AUDIENCE_MATRIX = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events
            WHERE value > 200),
tys AS (SELECT DISTINCT event_type FROM events WHERE value > 200)
SELECT a.event_type AS done_type, t.event_type AS missing_type,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM ut a CROSS JOIN tys t
WHERE NOT EXISTS (
  SELECT 1 FROM ut b
  WHERE b.user_id = a.user_id AND b.event_type = t.event_type
)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_bfs_hops(sf_dir: str) -> pa.Table:
    """Distributed multi-source BFS over the exact Jaccard >= 0.5 pair
    graph: per document in any pair, its HOP DISTANCE to the
    component's canonical representative (the min doc_id that
    `jaccard_clusters` elects) — the lineage-depth diagnostic for
    near-dup clusters (hops == how many near-dup steps separate a doc
    from its cluster exemplar; a deep chain is drift, hops 1 from a
    star center is a template).

    Third iterative-family member after `pagerank_parts` and the
    hash-to-min components: seeds = component minima from
    `connected_components_ds`, then level-synchronous frontier
    expansion (`functions/graph.py::bfs_hops`) — one bucketed hash
    join + groupby-min + anti-join per round, rounds = graph diameter.
    Oracle: the jaccard_clusters recursive min-label CTE extended with
    a shortest-path walk (UNION-dedup'd (node, depth) states, depth
    capped at 64 like the engine's max_iters)."""
    from ...functions.dedup import connected_components_ds
    from ...functions.graph import bfs_hops

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _exact_jaccard_pairs_ds(ds).map_batches(
        lambda t: t.select(["id_a", "id_b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()  # consumed twice: component labels + edge list
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "hops": pa.array([], pa.int64())}
    )
    if pairs.count() == 0:
        return empty
    comps = connected_components_ds(pairs)
    seeds = comps.map_batches(
        lambda t: (lambda f: pa.table(
            {"node": f.column("doc_id").cast(pa.int64()),
             "hops": pa.array(np.zeros(f.num_rows, np.int64), pa.int64())}
        ))(t.filter(pc.equal(t.column("doc_id"), t.column("cluster_id")))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    edges = pairs.map_batches(
        lambda t: pa.table(
            {"src": pa.concat_arrays(
                [t.column("id_a").cast(pa.int64()).combine_chunks(),
                 t.column("id_b").cast(pa.int64()).combine_chunks()]),
             "dst": pa.concat_arrays(
                [t.column("id_b").cast(pa.int64()).combine_chunks(),
                 t.column("id_a").cast(pa.int64()).combine_chunks()])}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    rows = bfs_hops(edges, seeds).take_all()
    if not rows:
        return empty
    return pa.Table.from_pylist(
        [{"doc_id": r["node"], "hops": r["hops"]} for r in rows]
    ).sort_by("doc_id")


ORACLE_BFS_HOPS = r"""
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
comps AS (SELECT id, min(comp) AS comp FROM walk GROUP BY id),
bfs(id, d) AS (
  SELECT id, 0 FROM comps WHERE id = comp
  UNION
  SELECT e.v, b.d + 1 FROM bfs b JOIN edges e ON e.u = b.id
  WHERE b.d < 64
)
SELECT id AS doc_id, CAST(min(d) AS BIGINT) AS hops FROM bfs GROUP BY id
ORDER BY doc_id
"""


def q_version_churn_per_path(sf_dir: str) -> ray.data.Dataset:
    """Code-churn analytics over the CDC stream itself — per (repo,
    path): how much each upsert CHANGED the content, as the exact
    token-overlap sums across consecutive version pairs (sum_inter /
    sum_union over all adjacent pairs; 1 - inter/union is the mean
    Jaccard churn).  The content-evolution-rate signal a code-corpus
    lake needs (a path whose versions share no tokens is a rewrite; a
    near-1 overlap stream is comment noise) — and the reference's
    sync loop has nothing like it because it never compares adjacent
    versions (src/ch_eth/sync.rs applies them blindly).

    One (repo,path)-keyed bucket exchange; inside the bucket the
    version-pair set intersections are computed WITHOUT per-pair work:
    every version's tokens flatten into one stream (Arrow RE2 split),
    one Arrow sort by (token, version-position) groups each token's
    version list, and two shifted compares find (a) duplicate tokens
    within a version (dedup to DISTINCT) and (b) adjacent-rank hits —
    a token in versions r and r+1 of the same key is exactly one
    adjacent pair in that sorted order.  Per-version bincounts +
    per-key reduceat fold the pair sums; no loop over pairs, keys, or
    versions."""
    from ...functions.text import token_strings
    from ...functions.window import keyed_window, segment_starts

    import glob as _glob

    stream = _derive_cdc_stream(sf_dir)

    def prep(t: pa.Table) -> pa.Table:
        f = t.filter(
            pc.and_(
                pc.not_equal(t.column("op"), pa.scalar("delete")),
                pc.or_(
                    pc.less(t.column("commit_seq"), pa.scalar(_ORPHAN_LO)),
                    pc.greater(t.column("commit_seq"), pa.scalar(_ORPHAN_HI)),
                ),
            )
        )
        return f.append_column(
            "__k",
            pc.binary_join_element_wise(
                f.column("repo"), f.column("path"), "\x00"
            ),
        )

    ds = ray.data.read_parquet(
        sorted(_glob.glob(os.path.join(stream, "events-*.parquet"))),
        columns=["repo", "path", "commit_seq", "content", "op"],
    ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    _EMPTY = pa.table(
        {"repo": pa.array([], pa.string()),
         "path": pa.array([], pa.string()),
         "n_versions": pa.array([], pa.int64()),
         "sum_inter": pa.array([], pa.int64()),
         "sum_union": pa.array([], pa.int64())}
    )

    def fn(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _EMPTY
        key = g.column("__k").combine_chunks()
        vocab = pa.array(sorted(pc.unique(key).to_pylist()))
        kcode = pc.index_in(key, value_set=vocab).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        seq = g.column("commit_seq").to_numpy(zero_copy_only=False)
        order = np.lexsort((seq, kcode))
        kcode = kcode[order]
        take = pa.array(order, pa.int64())
        content = g.column("content").take(take)
        starts = segment_starts(kcode)
        start_idx = np.flatnonzero(starts)
        V = len(kcode)
        nv = np.diff(np.append(start_idx, V))
        flat, vidx = token_strings(content)
        n_v = np.zeros(V, np.int64)
        inter_v = np.zeros(V, np.int64)
        if len(vidx):
            tt = pa.table(
                {"tok": flat, "v": pa.array(vidx, pa.int64())}
            )
            si = pc.sort_indices(
                tt,
                sort_keys=[("tok", "ascending"), ("v", "ascending")],
            )
            tok_s = tt.column("tok").take(si).combine_chunks()
            v_s = tt.column("v").take(si).to_numpy(zero_copy_only=False)
            n = len(v_s)
            same_tok = np.zeros(n, bool)
            if n > 1:
                same_tok[1:] = pc.equal(
                    tok_s.slice(1), tok_s.slice(0, n - 1)
                ).to_numpy(zero_copy_only=False)
            run_id = np.cumsum(~same_tok)
            dup = np.zeros(n, bool)
            if n > 1:
                dup[1:] = same_tok[1:] & (v_s[1:] == v_s[:-1])
            rid, vD = run_id[~dup], v_s[~dup]
            n_v = np.bincount(vD, minlength=V).astype(np.int64)
            if len(vD) > 1:
                adj = (
                    (rid[1:] == rid[:-1])
                    & (vD[1:] == vD[:-1] + 1)
                    & (kcode[vD[1:]] == kcode[vD[:-1]])
                )
                inter_v = np.bincount(
                    vD[:-1][adj], minlength=V
                ).astype(np.int64)
        not_last = np.ones(V, bool)
        not_last[np.append(start_idx[1:], V) - 1] = False
        not_first = ~starts
        sum_inter = np.add.reduceat(inter_v, start_idx)
        sum_union = (
            np.add.reduceat(
                n_v * not_last.astype(np.int64)
                + n_v * not_first.astype(np.int64),
                start_idx,
            )
            - sum_inter
        )
        keep = nv >= 2
        first = pa.array(start_idx[keep], pa.int64())
        return pa.table(
            {
                "repo": g.column("repo").take(take).take(first),
                "path": g.column("path").take(take).take(first),
                "n_versions": pa.array(nv[keep], pa.int64()),
                "sum_inter": pa.array(sum_inter[keep], pa.int64()),
                "sum_union": pa.array(sum_union[keep], pa.int64()),
            }
        )

    return keyed_window(ds, "__k", fn)


ORACLE_VERSION_CHURN = rf"""
WITH {_EV_CTE},
up AS (
  SELECT repo, path, commit_seq, lower(content) AS c
  FROM eff WHERE op <> 'delete'
),
r AS (
  SELECT repo, path,
         CAST(row_number() OVER (
           PARTITION BY repo, path ORDER BY commit_seq) - 1 AS BIGINT)
           AS rk,
         c
  FROM up
),
tok AS (
  SELECT DISTINCT repo, path, rk, t
  FROM r, UNNEST(regexp_extract_all(c, '\w+')) AS u(t)
),
sz0 AS (SELECT repo, path, rk, count(*) AS n FROM tok GROUP BY 1, 2, 3),
sz AS (
  SELECT r.repo, r.path, r.rk, COALESCE(s.n, 0) AS n
  FROM r LEFT JOIN sz0 s
    ON s.repo = r.repo AND s.path = r.path AND s.rk = r.rk
),
iv AS (
  SELECT a.repo, a.path, a.rk, count(*) AS ni
  FROM tok a JOIN tok b
    ON a.repo = b.repo AND a.path = b.path AND a.t = b.t
   AND b.rk = a.rk + 1
  GROUP BY 1, 2, 3
),
pr AS (
  SELECT sa.repo, sa.path,
         sa.n + sb.n - COALESCE(i.ni, 0) AS uni,
         COALESCE(i.ni, 0) AS ni
  FROM sz sa
  JOIN sz sb ON sa.repo = sb.repo AND sa.path = sb.path
            AND sb.rk = sa.rk + 1
  LEFT JOIN iv i ON i.repo = sa.repo AND i.path = sa.path
                AND i.rk = sa.rk
),
nv AS (SELECT repo, path, count(*) AS n_versions FROM r GROUP BY 1, 2)
SELECT nv.repo, nv.path,
       CAST(nv.n_versions AS BIGINT) AS n_versions,
       CAST(COALESCE(sum(pr.ni), 0) AS BIGINT) AS sum_inter,
       CAST(COALESCE(sum(pr.uni), 0) AS BIGINT) AS sum_union
FROM nv
LEFT JOIN pr ON pr.repo = nv.repo AND pr.path = nv.path
WHERE nv.n_versions >= 2
GROUP BY 1, 2, 3
ORDER BY 1, 2
"""


def q_lang_source_chi2(sf_dir: str) -> pa.Table:
    """Chi-square independence cells for the (source x lang)
    contingency table — the corpus-drift screen ('is language mix
    independent of source?').  Distributed part = per-batch partial
    (source, lang) counts folded through one tiny groupby-sum; the
    driver expands the <= |S| x |L| margin product (INCLUDING
    zero-observed cells, which a naive GROUP BY would drop but the
    test requires) and emits per-CELL terms.  Floats are bit-exact by
    construction: expected and chi2_term are computed per cell from
    exact integer margins with the operation tree mirrored in the SQL
    ((o-e)*(o-e)/e, no pow), and no float is ever summed across rows."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["source", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {"source": t.column("source"), "lang": t.column("lang")}
        )
        return tt.group_by(["source", "lang"]).aggregate(
            [([], "count_all")]
        ).rename_columns(["source", "lang", "n"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "lang"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )  # <= |S| x |L| rows
    obs = {(r["source"], r["lang"]): r["n"] for r in cells}
    sources = sorted({s for s, _ in obs})
    langs = sorted({l for _, l in obs})
    rs = {s: sum(v for (a, _), v in obs.items() if a == s) for s in sources}
    cs = {l: sum(v for (_, b), v in obs.items() if b == l) for l in langs}
    grand = float(sum(obs.values()))
    rows = {
        "source": [], "lang": [], "observed": [],
        "expected": [], "chi2_term": [],
    }
    for s in sources:
        for l in langs:
            o = float(obs.get((s, l), 0))
            e = float(rs[s]) * float(cs[l]) / grand
            rows["source"].append(s)
            rows["lang"].append(l)
            rows["observed"].append(int(obs.get((s, l), 0)))
            rows["expected"].append(e)
            rows["chi2_term"].append((o - e) * (o - e) / e)
    return pa.table(
        {
            "source": pa.array(rows["source"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
            "observed": pa.array(rows["observed"], pa.int64()),
            "expected": pa.array(rows["expected"], pa.float64()),
            "chi2_term": pa.array(rows["chi2_term"], pa.float64()),
        }
    )


ORACLE_LANG_SOURCE_CHI2 = """
WITH c AS (SELECT source, lang, count(*) AS o FROM documents GROUP BY 1, 2),
rs AS (SELECT source, sum(o) AS r FROM c GROUP BY 1),
cs AS (SELECT lang, sum(o) AS l FROM c GROUP BY 1),
g AS (SELECT sum(o) AS n FROM c)
SELECT rs.source, cs.lang,
       CAST(COALESCE(c.o, 0) AS BIGINT) AS observed,
       CAST(rs.r AS DOUBLE) * CAST(cs.l AS DOUBLE) / CAST(g.n AS DOUBLE)
         AS expected,
       (CAST(COALESCE(c.o, 0) AS DOUBLE)
          - CAST(rs.r AS DOUBLE) * CAST(cs.l AS DOUBLE)
            / CAST(g.n AS DOUBLE))
       * (CAST(COALESCE(c.o, 0) AS DOUBLE)
          - CAST(rs.r AS DOUBLE) * CAST(cs.l AS DOUBLE)
            / CAST(g.n AS DOUBLE))
       / (CAST(rs.r AS DOUBLE) * CAST(cs.l AS DOUBLE)
          / CAST(g.n AS DOUBLE)) AS chi2_term
FROM rs CROSS JOIN cs CROSS JOIN g
LEFT JOIN c ON c.source = rs.source AND c.lang = cs.lang
ORDER BY 1, 2
"""


def q_readability_documents(sf_dir: str) -> ray.data.Dataset:
    """Flesch reading-ease per document (Flesch 1948 — the classic
    readability curation filter, distinct from `doc_quality`'s
    length/punct ratios: it needs SENTENCE segmentation and a syllable
    proxy).  words = \\w+ runs, sentence breaks = [.!?]+ runs (floored
    at 1 — an unpunctuated doc is one long sentence), syllables ~
    [aeiouy]+ vowel groups in the lowered text — three RE2 counts per
    row (count_substring_regex), identical patterns in the oracle, and
    the score 206.835 - 1.015*(w/s) - 84.6*(syl/w) is per-row float
    arithmetic on exact integers (never summed), so parity is
    bit-exact; NULL where a doc has no words.
    Embarrassingly parallel: zero exchange."""
    from ...functions.text import _count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        w = _count(txt, r"\w+").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        s = np.maximum(
            _count(txt, r"[.!?]+").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            1,
        )
        syl = _count(pc.utf8_lower(txt), r"[aeiouy]+").cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        ok = w > 0
        wf = w.astype(np.float64)
        sf = s.astype(np.float64)
        sylf = syl.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            score = 206.835 - 1.015 * (wf / sf) - 84.6 * (sylf / wf)
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "n_words": pa.array(w, pa.int64()),
                "n_sentences": pa.array(s, pa.int64()),
                "n_syllables": pa.array(syl, pa.int64()),
                "flesch": pa.array(score, pa.float64(), mask=~ok),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_READABILITY = r"""
WITH c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n_words,
         GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT),
                  1) AS n_sentences,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
           AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CASE WHEN n_words > 0 THEN
         206.835
         - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
         - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
       END AS flesch
FROM c
"""


def q_max_drawdown_per_user(sf_dir: str) -> pa.Table:
    """Per-user maximum drawdown of the value series ordered by
    (ts, event_id): max over t of (running max − current value) — the
    classic peak-to-trough statistic (engagement decay / balance
    monitoring).  One keyed exchange; inside each bucket a single
    lexsort + per-user running cummax via the int64 offset lift
    (loop-free, same device as `q_pareto_events`, with the overflow
    fallback), then one maximum.reduceat per user segment.  Integer
    cents end to end → exact window-function oracle parity."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    _EMPTY = pa.table(
        {"user_id": pa.array([], pa.int64()),
         "max_drawdown": pa.array([], pa.int64())}
    )

    def fn(g: pa.Table) -> pa.Table:
        n = len(g)
        if n == 0:
            return _EMPTY
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            g.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        cents = _cents(g.column("value")).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, cents = uid[order], cents[order]
        new_uid = segment_starts(uid)
        ustart = np.flatnonzero(new_uid)
        seg_id = np.cumsum(new_uid) - 1
        lo = int(cents.min())
        rng = int(cents.max()) - lo + 2
        if rng * int(seg_id[-1] + 1) < 2**62:
            lifted = (cents - lo) + seg_id * rng
            cm = np.maximum.accumulate(lifted) - seg_id * rng + lo
        else:  # pragma: no cover - fixture cents never span 2^62
            cm = cents.copy()
            for s, e in zip(ustart, np.append(ustart[1:], n)):
                np.maximum.accumulate(cents[s:e], out=cm[s:e])
        dd = np.maximum.reduceat(cm - cents, ustart)
        return pa.table(
            {"user_id": pa.array(uid[ustart], pa.int64()),
             "max_drawdown": pa.array(dd, pa.int64())}
        )

    return keyed_window(ds, "user_id", fn)


ORACLE_MAX_DRAWDOWN = """
WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT user_id, cents,
         max(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS rm
  FROM c
)
SELECT user_id, max(rm - cents) AS max_drawdown
FROM r GROUP BY user_id
"""


def q_wow_change_per_type(sf_dir: str) -> pa.Table:
    """Week-over-week event-count delta per type — the growth/decay
    monitor over the ingest stream.  Per-batch (type, epoch-week)
    bincount partials fold through one tiny groupby (≤ types × weeks
    rows); the LAG over each type's OBSERVED weeks (gap weeks skipped,
    matching SQL LAG) runs on the driver over that small result.
    Integer µs week arithmetic, all-integer output."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    WEEK_US = 604_800_000_000

    _EMPTY = pa.table(
        {"event_type": pa.array([], pa.string()),
         "wk": pa.array([], pa.int64()),
         "n_events": pa.array([], pa.int64())}
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY
        codes = pc.dictionary_encode(t.column("event_type"))
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        names = codes.dictionary.to_pylist()
        us = (
            t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        wk = us // WEEK_US
        w0 = wk.min() if len(wk) else 0
        nweeks = int(wk.max() - w0 + 1) if len(wk) else 0
        cell = idx * nweeks + (wk - w0)
        cnt = np.bincount(cell, minlength=len(names) * nweeks)
        keep = np.flatnonzero(cnt)
        return pa.table(
            {
                "event_type": pa.array(
                    [names[int(c) // nweeks] for c in keep], pa.string()
                ),
                "wk": pa.array(keep % nweeks + w0, pa.int64()),
                "n_events": pa.array(cnt[keep], pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "wk"])
        .aggregate(Sum("n_events", alias_name="n_events"))
        .take_all()
    )
    t = _from_rows(
        rows,
        {"event_type": pa.string(), "wk": pa.int64(), "n_events": pa.int64()},
    ).sort_by([("event_type", "ascending"), ("wk", "ascending")])
    n = t.column("n_events").to_numpy(zero_copy_only=False)
    et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
    first = np.concatenate(([True], et[1:] != et[:-1])) if len(et) else (
        np.array([], dtype=bool)
    )
    prev = np.empty(len(n), np.int64)
    if len(n):
        prev[1:] = n[:-1]
    delta = n - prev
    return t.append_column(
        "wow_delta", pa.array(np.where(first, None, delta), pa.int64())
    )


ORACLE_WOW_CHANGE = """
WITH w AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT event_type, wk, n_events,
       n_events - lag(n_events) OVER (PARTITION BY event_type ORDER BY wk)
         AS wow_delta
FROM w
"""


def q_quantize_embeddings(sf_dir: str) -> ray.data.Dataset:
    """Symmetric int8 quantization of the embedding column (max-abs
    scale per vector, the standard ANN-index compression step) with
    per-vector integrity stats: scale (micro-units), sum / sum-of-
    squares / min / max of the int8 codes.  Embarrassingly parallel —
    one vectorized pass per batch over the flattened list buffer,
    zero shuffle; elements are integerized to micro-units once so the
    quantizer `floor(127·m/s + 0.5)` is the same IEEE double
    expression tree on both sides (bit-exact parity, the
    `lm_bigram_documents` technique)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def fn(t: pa.Table) -> pa.Table:
        emb = t.column("embedding")
        if emb.num_chunks > 0:
            emb = emb.combine_chunks()
        n = len(emb)
        if n == 0:
            return pa.table(
                {c: pa.array([], pa.int64())
                 for c in ("vec_id", "s_micro", "q_sum", "q_sumsq",
                           "q_min", "q_max")}
            )
        offs = np.asarray(emb.offsets)
        starts = offs[:-1].astype(np.int64)
        lens = np.diff(offs).astype(np.int64)
        # reduceat misbehaves on zero-length segments (an empty vector
        # would steal its neighbour's first element; an empty LAST
        # vector would index past the end) — fixtures are fixed-dim,
        # so assert rather than silently mis-aggregate (ADVICE r03)
        if n and lens.min() == 0:
            raise ValueError(
                "quantize_embeddings: empty embedding vectors are not "
                "supported (drop or pad zero-length lists upstream)"
            )
        m = _micro(pc.list_flatten(emb)).to_numpy(zero_copy_only=False)
        s = np.maximum.reduceat(np.abs(m), starts)
        s_row = np.repeat(s, lens)
        mf = m.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            qf = np.floor(127.0 * mf / s_row.astype(np.float64) + 0.5)
        q = np.where(s_row == 0, 0, qf).astype(np.int64)
        return pa.table(
            {
                "vec_id": t.column("vec_id").cast(pa.int64()),
                "s_micro": pa.array(s, pa.int64()),
                "q_sum": pa.array(np.add.reduceat(q, starts), pa.int64()),
                "q_sumsq": pa.array(
                    np.add.reduceat(q * q, starts), pa.int64()
                ),
                "q_min": pa.array(np.minimum.reduceat(q, starts), pa.int64()),
                "q_max": pa.array(np.maximum.reduceat(q, starts), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_QUANTIZE = """
WITH u AS (
  SELECT vec_id,
         CAST(ROUND(CAST(u.e AS DOUBLE) * 1000000.0) AS BIGINT) AS m
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS e) u
),
s AS (SELECT vec_id, max(abs(m)) AS s_micro FROM u GROUP BY 1),
q AS (
  SELECT u.vec_id, s.s_micro,
         CASE WHEN s.s_micro = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(FLOOR(127.0 * CAST(u.m AS DOUBLE)
                              / CAST(s.s_micro AS DOUBLE) + 0.5) AS BIGINT)
         END AS qv
  FROM u JOIN s ON u.vec_id = s.vec_id
)
SELECT vec_id, s_micro,
       CAST(sum(qv) AS BIGINT) AS q_sum,
       CAST(sum(qv * qv) AS BIGINT) AS q_sumsq,
       min(qv) AS q_min, max(qv) AS q_max
FROM q GROUP BY vec_id, s_micro
"""


def q_decile_doc_lengths(sf_dir: str) -> pa.Table:
    """Lorenz-curve cells of corpus concentration: split docs into 10
    exact NTILE groups by (n_chars, doc_id) and report each decile's
    doc count and char mass — 'what share of the corpus is its longest
    10% of docs'.  No global sort: a composite unique order key
    (n_chars · (max_id+1) + doc_id) rides the range-partitioned
    two-pass rank (the `user_value_percent_rank` shape — driver holds
    R integers), row_number is exact because the key is unique, and
    the SQL NTILE group boundary (first N mod 10 tiles get one extra
    row) is the same integer formula on both sides.  Per-tile sums
    fold from ≤ 10-row batch partials."""
    from ...functions.window import default_num_buckets, keyed_window, \
        segment_starts

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    agg = ds.aggregate(
        Max("doc_id", alias_name="max_id"),
        Count(alias_name="n"),
    )
    max_id, n_total = int(agg["max_id"]), int(agg["n"])
    M = max_id + 1

    def keyed(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").cast(pa.int64())
        nch = t.column("n_chars").cast(pa.int64())
        key = pc.add(pc.multiply(nch, pa.scalar(M, pa.int64())), did)
        return pa.table({"key": key, "n_chars": nch})

    withkey = ds.map_batches(keyed, batch_format="pyarrow",
                             zero_copy_batch=True)
    kagg = withkey.aggregate(
        Min("key", alias_name="lo"), Max("key", alias_name="hi")
    )
    lo, hi = int(kagg["lo"]), int(kagg["hi"])
    R = default_num_buckets()
    span = max(hi - lo, 1)

    def tag(t: pa.Table) -> pa.Table:
        v = t.column("key").to_numpy(zero_copy_only=False)
        rid = np.clip((v - lo) * R // (span + 1), 0, R - 1)
        return t.append_column("__r", pa.array(rid.astype(np.int64)))

    ranged = withkey.map_batches(tag, batch_format="pyarrow",
                                 zero_copy_batch=True)
    counts_rows = (
        ranged.map_batches(
            lambda t: t.select(["__r"]).group_by("__r").aggregate(
                [("__r", "count")]
            ).rename_columns(["__r", "c"]),
            batch_format="pyarrow",
        )
        .groupby("__r")
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    ct = _from_rows(
        counts_rows, {"__r": pa.int64(), "c": pa.int64()}
    ).sort_by("__r")
    offsets_arr = np.zeros(R, dtype=np.int64)
    offsets_arr[ct.column("__r").to_numpy(zero_copy_only=False)] = (
        ct.column("c").to_numpy(zero_copy_only=False)
    )
    offsets_arr = np.concatenate(([0], np.cumsum(offsets_arr)[:-1]))
    offsets = {int(r): int(offsets_arr[r]) for r in range(R)}
    # SQL NTILE(10): q = N // 10 rows per tile, the first r = N % 10
    # tiles take one extra row
    q10, r10 = divmod(n_total, 10)

    def per_range(g: pa.Table) -> pa.Table:
        rid = g.column("__r").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        nch = g.column("n_chars").to_numpy(zero_copy_only=False)
        order = np.lexsort((key, rid))
        rid, key, nch = rid[order], key[order], nch[order]
        starts = np.flatnonzero(segment_starts(rid))
        rownum = np.empty(len(key), dtype=np.int64)
        for s, e in zip(starts, np.append(starts[1:], len(rid))):
            rownum[s:e] = (
                offsets[int(rid[s])] + np.arange(1, e - s + 1)
            )  # keys are globally unique → local order IS row_number
        cut = r10 * (q10 + 1)
        if q10 > 0:
            tile = np.where(
                rownum <= cut,
                (rownum - 1) // (q10 + 1) + 1,
                r10 + (rownum - cut - 1) // q10 + 1,
            )
        else:  # fewer docs than tiles: first r10 tiles get one row each
            tile = rownum
        t10 = np.bincount(tile, minlength=11)[1:]
        s10 = np.bincount(tile, weights=nch.astype(np.float64),
                          minlength=11)[1:].astype(np.int64)
        keep = np.flatnonzero(t10)
        return pa.table(
            {
                "tile": pa.array(keep + 1, pa.int64()),
                "n_docs": pa.array(t10[keep], pa.int64()),
                "sum_chars": pa.array(s10[keep], pa.int64()),
            }
        )

    rows = (
        keyed_window(ranged, "__r", per_range)
        .groupby("tile")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
        )
        .take_all()
    )
    return _from_rows(
        rows,
        {"tile": pa.int64(), "n_docs": pa.int64(), "sum_chars": pa.int64()},
    ).sort_by("tile")


ORACLE_DECILE_LENGTHS = """
WITH t AS (
  SELECT n_chars,
         CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS tile
  FROM documents
)
SELECT tile, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM t GROUP BY tile ORDER BY tile
"""


def q_k_anonymity_documents(sf_dir: str) -> pa.Table:
    """k-anonymity audit over the (lang, source) quasi-identifier:
    groups holding fewer than k=10 docs are re-identification risks a
    release pipeline must generalize or drop (Sweeney 2002) — the
    compliance sibling of the purge verb.  Per-batch partial counts
    (≤ |langs|×|sources| rows), one tiny fold, driver-side filter."""
    K = 10
    ds = _read(sf_dir, "documents", ["lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        # count_all (not a column count): matches SQL count(*) even
        # when the counted column holds nulls (ADVICE r03)
        return (
            t.group_by(["lang", "source"])
            .aggregate([([], "count_all")])
            .rename_columns(["lang", "source", "n_docs"])
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "source"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .take_all()
    )
    t = _from_rows(
        rows,
        {"lang": pa.string(), "source": pa.string(), "n_docs": pa.int64()},
    )
    return t.filter(pc.less(t.column("n_docs"), pa.scalar(K))).sort_by(
        [("lang", "ascending"), ("source", "ascending")]
    )


ORACLE_K_ANONYMITY = """
SELECT lang, source, count(*) AS n_docs
FROM documents
GROUP BY lang, source
HAVING count(*) < 10
ORDER BY lang, source
"""


