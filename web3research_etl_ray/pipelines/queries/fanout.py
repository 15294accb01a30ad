"""Broadcast join + multi-table fan-out (3-table and Tron-width 44-table).

Split from the monolithic queries.py (VERDICT r04 Next #7); the
source text of every operator is unchanged — only module boundaries
and explicit imports were added.  Registered in ``queries._registry``.
"""

from ._shared import (  # noqa: F401
    Sum,
    _cents,
    _from_rows,
    _read,
    _tbl,
    np,
    pa,
    pc,
    pq,
    ray,
)
from .cdc import (  # noqa: F401
    _EV_CTE,
    _ORPHAN_HI,
    _ORPHAN_LO,
    _derive_cdc_stream,
    q_cdc_replay_lake,
)

# ---------------------------------------------------------------------------
# 5. Broadcast join (small-side lookup, no shuffle)
# ---------------------------------------------------------------------------


def q_broadcast_join_segment(sf_dir: str) -> pa.Table:
    """orders ⋈ customer via broadcast Arrow arrays (ray.put once,
    vectorized ``pc.index_in`` + ``take`` per batch — no per-row
    Python loop; VERDICT r01 Wrong #6)."""
    import ray as _ray

    cust = pq.read_table(_tbl(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    lookup_ref = _ray.put(
        (cust.column("c_custkey").combine_chunks(),
         cust.column("c_mktsegment").combine_chunks())
    )
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def join(t: pa.Table) -> pa.Table:
        keys, vals = _ray.get(lookup_ref)
        idx = pc.index_in(t.column("o_custkey"), keys)
        seg = pc.take(vals, idx)
        t = pa.table(
            {"c_mktsegment": seg, "price_cents": _cents(t.column("o_totalprice"))}
        )
        return (
            t.group_by("c_mktsegment")
            .aggregate([("price_cents", "sum"), ("price_cents", "count")])
            .rename_columns(["c_mktsegment", "sum_price_cents", "n_orders"])
        )

    return (
        ds.map_batches(join, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_mktsegment")
        .aggregate(
            Sum("sum_price_cents", alias_name="sum_price_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )


ORACLE_BROADCAST = """
SELECT c_mktsegment,
       CAST(sum(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_tpch_q1(sf_dir: str) -> pa.Table:
    """TPC-H Q1-style pricing summary (grouped aggregate benchmark
    headline), integer-cents sums for exact parity."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.less_equal(t.column("l_shipdate"), pa.scalar(np.datetime64("1998-09-02", "us")))
        )
        disc_price = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        g = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty_cents": _cents(t.column("l_quantity")),
                "price_cents": _cents(t.column("l_extendedprice")),
                "disc_price_cents": _cents(disc_price),
            }
        )
        return (
            g.group_by(["l_returnflag", "l_linestatus"])
            .aggregate(
                [("qty_cents", "sum"), ("price_cents", "sum"),
                 ("disc_price_cents", "sum"), ("qty_cents", "count")]
            )
            .rename_columns(
                ["l_returnflag", "l_linestatus", "sum_qty_cents",
                 "sum_base_price_cents", "sum_disc_price_cents", "count_order"]
            )
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty_cents", alias_name="sum_qty_cents"),
            Sum("sum_base_price_cents", alias_name="sum_base_price_cents"),
            Sum("sum_disc_price_cents", alias_name="sum_disc_price_cents"),
            Sum("count_order", alias_name="count_order"),
        )
    )


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       CAST(sum(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
       CAST(sum(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q6(sf_dir: str) -> pa.Table:
    """TPC-H Q6-style forecasting revenue change: pure filter +
    global sum — the read-pruning showcase (3 columns of lineitem
    leave storage, one int per batch leaves each task)."""
    ds = _read(
        sf_dir, "lineitem",
        ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(t.column("l_shipdate"), lo),
                pc.less(t.column("l_shipdate"), hi),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(t.column("l_discount"), pa.scalar(0.05)),
                    pc.less_equal(t.column("l_discount"), pa.scalar(0.07)),
                ),
                pc.less(t.column("l_quantity"), pa.scalar(24.0)),
            ),
        )
        t = t.filter(mask)
        rev = _cents(pc.multiply(t.column("l_extendedprice"),
                                 t.column("l_discount")))
        s = pc.sum(rev).as_py() or 0
        return pa.table({"revenue_cents": pa.array([s], pa.int64())})

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    total = parts.aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    return pa.table(
        {"revenue_cents": pa.array([total["revenue_cents"]], pa.int64())}
    )


ORACLE_Q6 = """
SELECT CAST(sum(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_tpch_q3(sf_dir: str) -> pa.Table:
    """TPC-H Q3-style shipping-priority: broadcast semi-filter
    (qualifying custkeys via ray.put — the dimension side is tiny
    next to lineitem at any scale) → bucketed hash join lineitem x
    filtered orders → per-batch partial revenue pre-agg → one
    groupby over (orderkey, date, priority) → per-batch partial
    top-10 → tiny final merge.  The composition showcase: every
    stage is an operator this engine already ships."""
    from ...functions.joins import hash_join

    cutoff = pa.scalar(np.datetime64("1998-06-01", "us"))
    cust = pq.read_table(
        _tbl(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    )
    keys = cust.filter(
        pc.equal(cust.column("c_mktsegment"), pa.scalar("BUILDING"))
    ).column("c_custkey").to_numpy(zero_copy_only=False)
    keys_ref = ray.put(np.sort(keys))

    orders = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def filter_orders(t: pa.Table) -> pa.Table:
        ck = ray.get(keys_ref)
        sel = np.isin(
            t.column("o_custkey").to_numpy(zero_copy_only=False), ck
        ) & pc.less(t.column("o_orderdate"), cutoff).to_numpy(
            zero_copy_only=False
        )
        return t.filter(pa.array(sel)).select(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ).rename_columns(["l_orderkey", "o_orderdate", "o_orderpriority"])

    lineitem = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: t.filter(pc.greater(t.column("l_shipdate"), cutoff)).drop_columns(["l_shipdate"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    forders = orders.map_batches(
        filter_orders, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = hash_join(
        lineitem, forders, "l_orderkey",
        left_cols=["l_orderkey", "l_extendedprice", "l_discount"],
        right_cols=["o_orderdate", "o_orderpriority"],
    )

    def partial_rev(t: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
        )
        return (
            pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "o_orderdate": t.column("o_orderdate"),
                    "o_orderpriority": t.column("o_orderpriority"),
                    "revenue_cents": rev,
                }
            )
            .group_by(["l_orderkey", "o_orderdate", "o_orderpriority"])
            .aggregate([("revenue_cents", "sum")])
            .rename_columns(
                ["l_orderkey", "o_orderdate", "o_orderpriority",
                 "revenue_cents"]
            )
        )

    K = 10
    from ...functions.window import keyed_window, segment_starts

    # (o_orderdate, o_orderpriority) are functions of l_orderkey, so
    # the final fold keys on orderkey alone through the hash-bucket
    # exchange (sort-based multi-key groupby is the 10x-slower path,
    # see BASELINE.md); date/priority ride along via segment-first
    def fold(g: pa.Table) -> pa.Table:
        ok = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        rev = g.column("revenue_cents").to_numpy(zero_copy_only=False)
        order = np.argsort(ok, kind="stable")
        ok_s = ok[order]
        starts = np.flatnonzero(segment_starts(ok_s))
        first = order[starts]
        return pa.table(
            {
                "l_orderkey": pa.array(ok_s[starts], pa.int64()),
                "o_orderdate": g.column("o_orderdate").take(
                    pa.array(first, pa.int64())
                ),
                "o_orderpriority": g.column("o_orderpriority").take(
                    pa.array(first, pa.int64())
                ),
                "revenue_cents": pa.array(
                    np.add.reduceat(rev[order], starts)
                    if len(starts) else np.zeros(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    summed = keyed_window(
        joined.map_batches(
            partial_rev, batch_format="pyarrow", zero_copy_batch=True
        ),
        "l_orderkey",
        fold,
    )

    def partial_top(t: pa.Table) -> pa.Table:
        return t.sort_by(
            [("revenue_cents", "descending"), ("l_orderkey", "ascending")]
        ).slice(0, K)

    top = (
        summed.map_batches(
            partial_top, batch_format="pyarrow", zero_copy_batch=True
        )
        .sort([("revenue_cents"), ("l_orderkey")], descending=[True, False])
        .limit(K)
        .take_all()
    )
    return _from_rows(
        top,
        {
            "l_orderkey": pa.int64(),
            "revenue_cents": pa.int64(),
            "o_orderdate": pa.timestamp("us"),
            "o_orderpriority": pa.string(),
        },
    )


ORACLE_Q3 = """
SELECT l_orderkey,
       CAST(sum(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate  > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
"""


def q_hash_join_orders_customer(sf_dir: str) -> pa.Table:
    """Partitioned hash join, both sides treated as large (bucket
    exchange + per-bucket vectorized merge) — the general-join
    companion to the broadcast join."""
    from ...functions.joins import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_mktsegment"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = hash_join(
        orders,
        cust,
        "o_custkey",
        left_cols=["o_orderkey", "o_totalprice"],
        right_cols=["c_mktsegment"],
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
                "c_mktsegment": t.column("c_mktsegment"),
                "o_totalprice_cents": _cents(t.column("o_totalprice")),
            }
        )

    return joined.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_HASH_JOIN = """
SELECT o_orderkey, c_mktsegment,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
FROM orders JOIN customer ON o_custkey = c_custkey
"""


#: order-value threshold for the outer/semi/anti join family: splits
#: customers into ~60% with and ~40% without a qualifying order, so
#: null-extension and existence paths are genuinely exercised.
_BIG_ORDER_CENTS = 45_000_000


def _big_orders(sf_dir: str) -> ray.data.Dataset:
    """High-value orders with the key renamed to the customer side's
    column name (hash_join joins on a shared key name)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("o_totalprice"))
        keep = pc.greater(cents, pa.scalar(_BIG_ORDER_CENTS, pa.int64()))
        return pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "o_totalprice_cents": cents,
            }
        ).filter(keep)

    return orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)


def q_left_join_customer_orders(sf_dir: str) -> pa.Table:
    """LEFT OUTER hash join: every customer, null-extended when no
    high-value order exists.  Same bucket exchange as the inner join —
    null extension is decided bucket-locally (a key lives in exactly
    one bucket)."""
    from ...functions.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    return hash_join(
        cust,
        _big_orders(sf_dir),
        "c_custkey",
        left_cols=["c_mktsegment"],
        right_cols=["o_orderkey", "o_totalprice_cents"],
        how="left",
    )


ORACLE_LEFT_JOIN = """
SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice_cents
FROM customer c
LEFT JOIN (
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
    FROM orders
    WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) > 45000000
) o ON o.o_custkey = c.c_custkey
"""


def q_semi_join_customers(sf_dir: str) -> pa.Table:
    """LEFT SEMI hash join: customers holding at least one high-value
    order, emitted once, left columns only."""
    from ...functions.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    return hash_join(
        cust,
        _big_orders(sf_dir),
        "c_custkey",
        left_cols=["c_mktsegment"],
        right_cols=[],
        how="semi",
    )


ORACLE_SEMI_JOIN = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND CAST(ROUND(o.o_totalprice * 100) AS BIGINT) > 45000000)
"""


def q_anti_join_customers(sf_dir: str) -> pa.Table:
    """LEFT ANTI hash join: customers with NO high-value order."""
    from ...functions.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    return hash_join(
        cust,
        _big_orders(sf_dir),
        "c_custkey",
        left_cols=["c_mktsegment"],
        right_cols=[],
        how="anti",
    )


ORACLE_ANTI_JOIN = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND CAST(ROUND(o.o_totalprice * 100) AS BIGINT) > 45000000)
"""


def q_asof_join_clicks_views(sf_dir: str) -> pa.Table:
    """As-of join (absent from both the reference and Ray Data —
    implemented as bucketed merge_asof): for each click, the latest
    view by the same user at or before the click."""
    from ...functions.joins import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    clicks = ev.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "click"))
        .drop_columns(["event_type"])
        .rename_columns(["click_id", "user_id", "ts"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    views = ev.map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "view"))
        .drop_columns(["event_type"])
        .rename_columns(["view_id", "user_id", "ts"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = asof_join(
        clicks, views, by="user_id", on="ts",
        left_cols=["click_id"], right_cols=["view_id"],
    )

    def project(t: pa.Table) -> pa.Table:
        vid = t.column("view_id").cast(pa.int64()).fill_null(-1)
        return pa.table(
            {
                "click_id": t.column("click_id").cast(pa.int64()),
                "view_id": vid,
            }
        )

    return joined.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_ASOF = """
SELECT c.event_id AS click_id, COALESCE(v.event_id, -1) AS view_id
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (
  -- pre-reduce to one view per (user_id, ts): max event_id — mirrors
  -- the engine's deterministic tie-break so parity is well-defined
  SELECT user_id, ts, max(event_id) AS event_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
) v
  ON c.user_id = v.user_id AND v.ts <= c.ts
"""


def q_repo_stats_lake(sf_dir: str) -> pa.Table:
    """Derived second table from the CDC lake (the reference's one-
    block→many-tables fan-out, src/ch_eth/init.rs:373-400, expressed as
    a downstream aggregate of the converged lake)."""
    lake = q_cdc_replay_lake(sf_dir)
    stats = (
        pa.table(
            {
                "repo": lake.column("repo"),
                "n_chars": pc.utf8_length(lake.column("content")).cast(pa.int64()),
                "commit_seq": lake.column("commit_seq"),
            }
        )
        .group_by("repo")
        .aggregate(
            [("n_chars", "count"), ("n_chars", "sum"), ("commit_seq", "max")]
        )
        .rename_columns(["repo", "n_paths", "sum_chars", "last_seq"])
    )
    return stats.sort_by([("repo", "ascending")])


ORACLE_REPO_STATS = f"""
WITH ev AS (
  SELECT source AS repo,
         'docs/' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
         i * 100000 + doc_id AS commit_seq,
         text || ' v' || CAST(i AS VARCHAR) AS content,
         CASE WHEN i = 2 AND doc_id % 37 = 0 THEN 'delete' ELSE 'upsert' END AS op
  FROM documents, (SELECT UNNEST([0, 1, 2]) AS i)
),
eff AS (
  SELECT * FROM ev WHERE commit_seq NOT BETWEEN {_ORPHAN_LO} AND {_ORPHAN_HI}
),
win AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM eff
),
lake AS (SELECT * FROM win WHERE rn = 1 AND op <> 'delete')
SELECT repo, count(*) AS n_paths, CAST(sum(length(content)) AS BIGINT) AS sum_chars,
       max(commit_seq) AS last_seq
FROM lake GROUP BY repo
"""


# ---------------------------------------------------------------------------
# 5b. Multi-table fan-out: one stream → three lake tables under ONE
#     atomic manifest commit — the reference's block→N-tables insert
#     loop (src/ch_eth/init.rs:146-341, concurrent inserts :403-424),
#     made cross-table atomic.  Each derived table has its own DuckDB
#     oracle over the same stream CTE.
# ---------------------------------------------------------------------------


def _fanout_tables():
    from ...schema import REPO_FILES, TableSpec
    from ..fanout import FanoutTable

    heads_schema = pa.schema(
        [
            pa.field("repo", pa.string(), nullable=False),
            pa.field("commit", pa.string(), nullable=False),
            pa.field("lang", pa.string(), nullable=False),
            pa.field("commit_seq", pa.int64(), nullable=False),
        ]
    )
    heads_spec = TableSpec(
        name="repo_heads",
        schema=heads_schema,
        key=("repo",),
        event_schema=heads_schema.append(pa.field("op", pa.string())),
    )

    def derive_heads(t: pa.Table) -> pa.Table:
        # every commit (upserts AND deletes) advances the repo head
        return pa.table(
            {
                "repo": t.column("repo"),
                "commit": t.column("commit"),
                "lang": t.column("lang"),
                "commit_seq": t.column("commit_seq"),
                "op": pa.array(["upsert"] * t.num_rows, pa.string()),
            }
        )

    langs_schema = pa.schema(
        [
            pa.field("repo", pa.string(), nullable=False),
            pa.field("lang", pa.string(), nullable=False),
            pa.field("path", pa.string(), nullable=False),
            pa.field("commit_seq", pa.int64(), nullable=False),
        ]
    )
    langs_spec = TableSpec(
        name="repo_langs",
        schema=langs_schema,
        key=("repo", "lang"),
        event_schema=langs_schema.append(pa.field("op", pa.string())),
    )

    def derive_langs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t.column("repo"),
                "lang": t.column("lang"),
                "path": t.column("path"),
                "commit_seq": t.column("commit_seq"),
                "op": pa.array(["upsert"] * t.num_rows, pa.string()),
            }
        )

    activity_schema = pa.schema(
        [
            pa.field("repo", pa.string(), nullable=False),
            pa.field("n_changes", pa.int64(), nullable=False),
            pa.field("content_chars", pa.int64(), nullable=False),
            pa.field("commit_seq", pa.int64(), nullable=False),
        ]
    )
    activity_spec = TableSpec(
        name="repo_activity",
        schema=activity_schema,
        key=("repo",),
        event_schema=activity_schema.append(pa.field("op", pa.string())),
        sum_cols=("n_changes", "content_chars"),
    )

    def derive_activity(t: pa.Table) -> pa.Table:
        # additive (SummingMergeTree) table: every surviving event adds
        # one change + its content length; sums accumulate across ticks
        n = t.num_rows
        return pa.table(
            {
                "repo": t.column("repo"),
                "n_changes": pa.array(np.ones(n, dtype=np.int64)),
                "content_chars": pc.utf8_length(t.column("content")).cast(
                    pa.int64()
                ),
                "commit_seq": t.column("commit_seq"),
                "op": pa.array(["upsert"] * n, pa.string()),
            }
        )

    return [
        FanoutTable(REPO_FILES, None),
        FanoutTable(heads_spec, derive_heads),
        FanoutTable(langs_spec, derive_langs),
        FanoutTable(activity_spec, derive_activity),
    ]


_FANOUT_LAKES: dict[str, str] = {}  # per-process cache: one build, N queries


def _fanout_lake(sf_dir: str) -> str:
    import shutil

    from ..fanout import replay_fanout

    stream = _derive_cdc_stream(sf_dir)
    lake_dir = stream + "-mlake"
    if _FANOUT_LAKES.get(sf_dir) != lake_dir:
        shutil.rmtree(lake_dir, ignore_errors=True)
        replay_fanout(stream, lake_dir, _fanout_tables(), num_partitions=8)
        _FANOUT_LAKES[sf_dir] = lake_dir
    return lake_dir


def q_fanout_repo_heads(sf_dir: str) -> pa.Table:
    """Second table of the atomic multi-table fan-out: per-repo head
    (latest commit over all non-orphaned events)."""
    from ..fanout import fanout_table

    t = fanout_table(_fanout_lake(sf_dir), "repo_heads")
    return t.select(["repo", "commit", "lang", "commit_seq"]).sort_by(
        [("repo", "ascending")]
    )


ORACLE_FANOUT_HEADS = f"""
WITH ev AS (
  SELECT source AS repo,
         'docs/' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
         i * 100000 + doc_id AS commit_seq,
         lang
  FROM documents, (SELECT UNNEST([0, 1, 2]) AS i)
),
eff AS (
  SELECT * FROM ev WHERE commit_seq NOT BETWEEN {_ORPHAN_LO} AND {_ORPHAN_HI}
),
win AS (
  SELECT *, row_number() OVER (PARTITION BY repo ORDER BY commit_seq DESC) AS rn
  FROM eff
)
SELECT repo,
       sha256(repo || '/' || path || '@' || CAST(commit_seq AS VARCHAR)) AS commit,
       lang, commit_seq
FROM win WHERE rn = 1
ORDER BY repo
"""


def q_fanout_repo_langs(sf_dir: str) -> pa.Table:
    """Third table of the atomic multi-table fan-out: per-(repo, lang)
    last-touched path."""
    from ..fanout import fanout_table

    t = fanout_table(_fanout_lake(sf_dir), "repo_langs")
    return t.select(["repo", "lang", "path", "commit_seq"]).sort_by(
        [("repo", "ascending"), ("lang", "ascending")]
    )


ORACLE_FANOUT_LANGS = f"""
WITH ev AS (
  SELECT source AS repo,
         'docs/' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
         i * 100000 + doc_id AS commit_seq,
         lang
  FROM documents, (SELECT UNNEST([0, 1, 2]) AS i)
),
eff AS (
  SELECT * FROM ev WHERE commit_seq NOT BETWEEN {_ORPHAN_LO} AND {_ORPHAN_HI}
),
win AS (
  SELECT *, row_number() OVER (PARTITION BY repo, lang ORDER BY commit_seq DESC) AS rn
  FROM eff
)
SELECT repo, lang, path, commit_seq
FROM win WHERE rn = 1
ORDER BY repo, lang
"""


def q_fanout_repo_activity(sf_dir: str) -> pa.Table:
    """Fourth table of the atomic fan-out — the ADDITIVE
    (SummingMergeTree-mode) one: per-repo change count + total content
    chars, accumulated across merge generations by ``sum_cols`` instead
    of last-writer-wins.  Same combiner → spool → merge-on-write path;
    the partial folds ship per-(key, block) SUMS, not raw events."""
    from ..fanout import fanout_table

    t = fanout_table(_fanout_lake(sf_dir), "repo_activity")
    return t.select(
        ["repo", "n_changes", "content_chars", "commit_seq"]
    ).sort_by([("repo", "ascending")])


ORACLE_FANOUT_ACTIVITY = f"""
WITH {_EV_CTE}
SELECT repo,
       count(*) AS n_changes,
       CAST(sum(length(content)) AS BIGINT) AS content_chars,
       max(commit_seq) AS commit_seq
FROM eff GROUP BY repo ORDER BY repo
"""


# ---------------------------------------------------------------------------
# 5b. Tron-width 44-table fan-out (pipelines/wide.py) — the reference's
# widest shape (one block → 44 tables, src/ch_tron/init.rs:76-214) with
# its hairiest types: decimal256 (UInt256), binary(20) key
# (FixedString(20)), and list<struct<..., map_>> (Map-inside-Nested,
# src/ch_tron/schema.rs:1976-1984).  One shared read, ONE MultiManifest
# commit for all 44.
# ---------------------------------------------------------------------------


_WIDE_LAKES: dict[str, str] = {}


def _wide_lake(sf_dir: str) -> str:
    import shutil

    from ..fanout import replay_fanout
    from ..wide import tron_width_tables

    stream = _derive_cdc_stream(sf_dir)
    lake_dir = stream + "-wlake"
    if _WIDE_LAKES.get(sf_dir) != lake_dir:
        shutil.rmtree(lake_dir, ignore_errors=True)
        # the documents-derived stream carries natural-language codes
        # (vs gen.py's code langs) — same 44-table registry, lang set
        # matched to the input
        replay_fanout(
            stream,
            lake_dir,
            tron_width_tables(
                langs=("en", "zh", "es", "de", "fr", "py", "rs")
            ),
            num_partitions=8,
        )
        _WIDE_LAKES[sf_dir] = lake_dir
    return lake_dir


def q_fanout_wide_valuations(sf_dir: str) -> pa.Table:
    """decimal256(76,0) payload (UInt256 analogue) through the full
    44-table fan-out merge; compared against DuckDB DECIMAL(38,0) after
    a width-only downcast (values fit well inside 38 digits)."""
    from ..fanout import fanout_table

    t = fanout_table(_wide_lake(sf_dir), "w_valuations")
    assert t.schema.field("value_wei").type == pa.decimal256(76, 0)
    # compare as int64: the fixture values fit, and DuckDB's DECIMAL
    # comes back float64 through pandas — the decimal256 AT-REST type
    # is what this query certifies (assert above)
    return pa.table(
        {
            "repo": t.column("repo"),
            "path": t.column("path"),
            "value_wei": t.column("value_wei").cast(pa.int64()),
            "commit_seq": t.column("commit_seq"),
        }
    ).sort_by([("repo", "ascending"), ("path", "ascending")])


ORACLE_FANOUT_WIDE_VAL = f"""
WITH {_EV_CTE},
win AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM eff
)
SELECT repo, path,
       CAST(length(content) * 1000000000 + commit_seq AS BIGINT) AS value_wei,
       commit_seq
FROM win WHERE rn = 1 AND op <> 'delete'
ORDER BY repo, path
"""


def q_fanout_wide_addr(sf_dir: str) -> pa.Table:
    """binary(20) KEY (FixedString(20) address analogue): the partition
    router hashes raw key bytes; the stored key round-trips to the hex
    the oracle derives with sha256()."""
    from ..fanout import fanout_table

    t = fanout_table(_wide_lake(sf_dir), "w_addresses")
    assert t.schema.field("addr").type == pa.binary(20)
    addr_hex = pa.array(
        [v.hex() for v in t.column("addr").to_pylist()], pa.string()
    )
    return pa.table(
        {
            "addr_hex": addr_hex,
            "repo": t.column("repo"),
            "path": t.column("path"),
            "commit_seq": t.column("commit_seq"),
        }
    ).sort_by([("addr_hex", "ascending")])


ORACLE_FANOUT_WIDE_ADDR = f"""
WITH {_EV_CTE},
win AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM eff
)
SELECT substr(sha256(repo || '/' || path), 1, 40) AS addr_hex,
       repo, path, commit_seq
FROM win WHERE rn = 1 AND op <> 'delete'
ORDER BY addr_hex
"""


def q_fanout_wide_refs(sf_dir: str) -> pa.Table:
    """Map-inside-Nested payload (list<struct<name, counts:
    map<string,int64>>>) stored at rest in the wide lake; scalars are
    extracted AFTER the parquet round-trip, so equality with the oracle
    proves the nested encoding survived spool, merge and commit."""
    from ..fanout import fanout_table

    t = fanout_table(_wide_lake(sf_dir), "w_refs")
    refs = t.column("refs").combine_chunks()
    structs = refs.flatten()  # one element per row by construction
    names = structs.field("name")
    counts = structs.field("counts")
    # ADVICE r04: derive entry positions from the map's OWN offsets —
    # .items ignores parent offset/slice, and hard-coded stride
    # arithmetic silently misaligns on sliced/chunked arrays or
    # reordered keys.  offsets values index the RAW items child, so
    # this stays exact under any layout; keys are matched by NAME.
    offs = counts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offs)
    assert (lens == 2).all(), "w_refs counts must carry exactly 2 entries"
    keys, items = counts.keys, counts.items
    first_is_len = pc.equal(
        keys.take(pa.array(offs[:-1])), "len"
    ).to_numpy(zero_copy_only=False)
    ref_len = items.take(
        pa.array(np.where(first_is_len, offs[:-1], offs[:-1] + 1))
    )
    ref_seq = items.take(
        pa.array(np.where(first_is_len, offs[:-1] + 1, offs[:-1]))
    )
    return pa.table(
        {
            "repo": t.column("repo"),
            "path": t.column("path"),
            "ref_name": names,
            "ref_len": ref_len,
            "ref_seq": ref_seq,
            "commit_seq": t.column("commit_seq"),
        }
    ).sort_by([("repo", "ascending"), ("path", "ascending")])


ORACLE_FANOUT_WIDE_REFS = f"""
WITH {_EV_CTE},
win AS (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
  FROM eff
)
SELECT repo, path,
       lang AS ref_name,
       length(content) AS ref_len,
       commit_seq AS ref_seq,
       commit_seq
FROM win WHERE rn = 1 AND op <> 'delete'
ORDER BY repo, path
"""


def q_fanout_wide_shards(sf_dir: str) -> pa.Table:
    """Union of the 10 repo-hash-sharded min/max watermark tables —
    shards are disjoint and together must reproduce the global per-repo
    first/last fold exactly (AggregatingMergeTree semantics at Tron
    width)."""
    from ..fanout import fanout_table
    from ..wide import N_SHARDS

    lake = _wide_lake(sf_dir)
    parts = []
    for s in range(N_SHARDS):
        st = fanout_table(lake, f"w_shard_{s}")
        if st.num_rows:
            parts.append(st.select(["repo", "first_seq", "last_seq"]))
    return pa.concat_tables(parts).sort_by([("repo", "ascending")])


ORACLE_FANOUT_WIDE_SHARDS = f"""
WITH {_EV_CTE}
SELECT repo, min(commit_seq) AS first_seq, max(commit_seq) AS last_seq
FROM eff GROUP BY repo ORDER BY repo
"""


def q_fanout_wide_langstat(sf_dir: str) -> pa.Table:
    """One of the 7 per-lang ADDITIVE tables of the 44-table registry
    (SummingMergeTree at Tron width): per-repo change count + content
    chars for lang='en' only (the documents-derived stream's lang set)."""
    from ..fanout import fanout_table

    t = fanout_table(_wide_lake(sf_dir), "w_langstat_en")
    return t.select(
        ["repo", "n_changes", "content_chars", "commit_seq"]
    ).sort_by([("repo", "ascending")])


ORACLE_FANOUT_WIDE_LANGSTAT = f"""
WITH {_EV_CTE}
SELECT repo,
       count(*) AS n_changes,
       CAST(sum(length(content)) AS BIGINT) AS content_chars,
       max(commit_seq) AS commit_seq
FROM eff WHERE lang = 'en' GROUP BY repo ORDER BY repo
"""


