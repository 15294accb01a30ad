"""TPC-H-shaped composites the fixture schema supports.

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
    _round_int,
    _tbl,
    np,
    pa,
    pc,
    pq,
    ray,
)
from .cdc import (  # noqa: F401
    ORACLE_SESSIONS,
    q_session_windows,
)

# ---------------------------------------------------------------------------
# wave 9: TPC-H-shaped composites the fixture schema supports
#         (Q4 EXISTS, Q14 promo share, Q18 large orders)
# ---------------------------------------------------------------------------


def q_late_orders_by_priority(sf_dir: str) -> pa.Table:
    """TPC-H Q4-shaped correlated EXISTS: orders in a 1996 window with
    at least one lineitem shipped > 90 days after the order date,
    counted by priority.  The predicate compares columns from BOTH
    sides, so it rides the bucketed hash join (attach o_orderdate /
    o_orderpriority to each lineitem), then per-batch distinct
    (orderkey, priority) partials fold to global distinct in the
    orderkey's bucket — EXISTS = first occurrence, never a row
    explosion.  All-integer output."""
    from ...functions.joins import hash_join
    from ...functions.window import keyed_window, segment_starts

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))
    LATE_US = 90 * 86_400_000_000

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t.column("o_orderdate"), lo),
                pc.less(t.column("o_orderdate"), hi),
            )
        ).select(["o_orderkey", "o_orderdate", "o_orderpriority"])
        .rename_columns(["l_orderkey", "o_orderdate", "o_orderpriority"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    joined = hash_join(
        lineitem, orders, "l_orderkey",
        left_cols=["l_orderkey", "l_shipdate"],
        right_cols=["o_orderdate", "o_orderpriority"],
    )

    def late_pairs(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64())
        odate = t.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64())
        keep = pc.greater(ship, pc.add(odate, pa.scalar(LATE_US, pa.int64())))
        return (
            pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "o_orderpriority": t.column("o_orderpriority"),
                }
            )
            .filter(keep)
            .group_by(["l_orderkey", "o_orderpriority"])
            .aggregate([])
        )

    pairs = joined.map_batches(
        late_pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        key = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        pri = np.asarray(
            g.column("o_orderpriority").to_pylist(), dtype=object
        )
        order = np.argsort(key, kind="stable")
        key, pri = key[order], pri[order]
        firsts = segment_starts(key)  # priority is functional on order
        pri = pri[firsts]
        vals, cnt = np.unique(pri, return_counts=True)
        return pa.table(
            {
                "o_orderpriority": pa.array(vals, pa.string()),
                "n_orders": pa.array(cnt, pa.int64()),
            }
        )

    rows = (
        keyed_window(pairs, "l_orderkey", fold)
        .groupby("o_orderpriority")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
        .take_all()
    )
    return _from_rows(
        rows, {"o_orderpriority": pa.string(), "n_orders": pa.int64()}
    ).sort_by("o_orderpriority")


ORACLE_LATE_ORDERS = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY 1 ORDER BY 1
"""


def q_promo_revenue_share(sf_dir: str) -> pa.Table:
    """TPC-H Q14-shaped promo share: revenue fraction from PROMO parts
    in one ship month.  part is the broadcast side (`ray.put` once,
    Acero probe per batch — zero exchange; at real TPC-H scale part
    grows with SF, so past the broadcast threshold this switches to
    the bucketed join like `auto_join` does); per-row revenue is
    rounded to exact cents on both sides, so only the final percent
    division is float — mirrored token-for-token."""
    from ...functions.joins import broadcast_join

    lo = pa.scalar(np.datetime64("1996-09-01", "us"))
    hi = pa.scalar(np.datetime64("1996-10-01", "us"))

    part = pq.read_table(
        _tbl(sf_dir, "part"), columns=["p_partkey", "p_type"]
    ).select(["p_partkey", "p_type"]).rename_columns(
        ["l_partkey", "p_type"]
    )

    lineitem = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t.column("l_shipdate"), lo),
                pc.less(t.column("l_shipdate"), hi),
            )
        ).drop_columns(["l_shipdate"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = broadcast_join(lineitem, part, "l_partkey")

    def partial(t: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
        ).to_numpy(zero_copy_only=False)
        promo = pc.equal(t.column("p_type"), "PROMO").to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "promo_cents": pa.array(
                    [int(rev[promo].sum())], pa.int64()
                ),
                "total_cents": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    parts = joined.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = parts.aggregate(
        Sum("promo_cents", alias_name="promo_cents"),
        Sum("total_cents", alias_name="total_cents"),
    )
    p, t = int(agg["promo_cents"] or 0), int(agg["total_cents"] or 0)
    share = (
        100.0 * (np.float64(p) / np.float64(t)) if t else float("nan")
    )
    return pa.table(
        {
            "promo_cents": pa.array([p], pa.int64()),
            "total_cents": pa.array([t], pa.int64()),
            "promo_share_pct": pa.array([share], pa.float64()),
        }
    )


ORACLE_PROMO_SHARE = """
WITH j AS (
  SELECT CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS rev,
         p_type = 'PROMO' AS is_promo
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-09-01'
    AND l_shipdate <  TIMESTAMP '1996-10-01'
),
s AS (
  SELECT CAST(sum(CASE WHEN is_promo THEN rev ELSE 0 END) AS BIGINT)
           AS promo_cents,
         CAST(sum(rev) AS BIGINT) AS total_cents
  FROM j
)
SELECT promo_cents, total_cents,
       100.0 * (CAST(promo_cents AS DOUBLE) / CAST(total_cents AS DOUBLE))
         AS promo_share_pct
FROM s
"""


def q_big_orders_topk(sf_dir: str) -> pa.Table:
    """TPC-H Q18-shaped large-order scan: orders whose total quantity
    ≥ 300, top 100 by quantity (orderkey tie-break).  Per-batch
    partial sums → keyed fold (exact integer quantities) → HAVING
    filter inside the bucket → bucketed join back to orders for the
    customer/date columns → per-batch partial top-100 so the driver
    merges ≤ 100 rows per block, never the full qualifying set."""
    from ...functions.joins import hash_join
    from ...functions.window import keyed_window, segment_starts

    K, THRESHOLD = 100, 300

    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        key = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        qty = _round_int(t.column("l_quantity")).to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, qty = key[order], qty[order]
        starts = np.flatnonzero(segment_starts(key))
        return pa.table(
            {
                "l_orderkey": pa.array(key[starts], pa.int64()),
                "total_qty": pa.array(
                    np.add.reduceat(qty, starts), pa.int64()
                ),
            }
        )

    partials = lineitem.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        key = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        qty = g.column("total_qty").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, qty = key[order], qty[order]
        starts = np.flatnonzero(segment_starts(key))
        total = np.add.reduceat(qty, starts)
        keep = total >= THRESHOLD
        return pa.table(
            {
                "l_orderkey": pa.array(key[starts][keep], pa.int64()),
                "total_qty": pa.array(total[keep], pa.int64()),
            }
        )

    qualifying = keyed_window(partials, "l_orderkey", fold)
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.select(
            ["o_orderkey", "o_custkey", "o_orderdate"]
        ).rename_columns(["l_orderkey", "o_custkey", "o_orderdate"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = hash_join(
        qualifying, orders, "l_orderkey",
        left_cols=["l_orderkey", "total_qty"],
        right_cols=["o_custkey", "o_orderdate"],
    )

    def topk(t: pa.Table) -> pa.Table:
        return t.sort_by(
            [("total_qty", "descending"), ("l_orderkey", "ascending")]
        ).slice(0, K)

    rows = joined.map_batches(
        topk, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    t = _from_rows(
        rows,
        {
            "l_orderkey": pa.int64(),
            "total_qty": pa.int64(),
            "o_custkey": pa.int64(),
            "o_orderdate": pa.timestamp("us"),
        },
    )
    t = t.sort_by(
        [("total_qty", "descending"), ("l_orderkey", "ascending")]
    ).slice(0, K)
    return t.rename_columns(
        ["o_orderkey", "total_qty", "o_custkey", "o_orderdate"]
    )


ORACLE_BIG_ORDERS = """
WITH q AS (
  SELECT l_orderkey,
         CAST(sum(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
           AS total_qty
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(ROUND(l_quantity) AS BIGINT)) >= 300
)
SELECT o.o_orderkey, q.total_qty, o.o_custkey, o.o_orderdate
FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey
ORDER BY total_qty DESC, o_orderkey LIMIT 100
"""


# ---------------------------------------------------------------------------
# wave 10: the remaining TPC-H composites the fixture schema supports
#          (Q5 local-supplier revenue, Q8 market share, Q10 returned
#          items, Q13 order-count distribution, Q15 top supplier,
#          Q22 idle-rich anti-join)
# ---------------------------------------------------------------------------


def _nation_names(sf_dir: str) -> dict[int, str]:
    """nationkey → n_name lookup (25 rows — a driver-side constant,
    like the reference's chain-config table)."""
    t = pq.read_table(_tbl(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    return dict(
        zip(
            t.column("n_nationkey").to_pylist(),
            t.column("n_name").to_pylist(),
        )
    )


def q_tpch_q5(sf_dir: str) -> pa.Table:
    """TPC-H Q5-shaped local-supplier revenue: for one region and one
    order year, revenue from lineitems whose supplier nation equals
    the ordering customer's nation, grouped by nation.  nation/region
    are driver constants (25/5 rows); customer and supplier are
    broadcast maps (`ray.put` once — at real scale customer crosses
    the broadcast threshold and rides `auto_join`'s bucketed path);
    the one genuine exchange is lineitem × orders on orderkey.
    Partials collapse to ≤ 25 nation rows per batch before the final
    fold."""
    from ...functions.joins import broadcast_join, hash_join

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    nation = pq.read_table(
        _tbl(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        _tbl(sf_dir, "region"), columns=["r_regionkey", "r_name"]
    )
    asia_rk = region.filter(pc.equal(region.column("r_name"), "ASIA")) \
        .column("r_regionkey").to_pylist()
    asia_nk = set(
        nation.filter(
            pc.is_in(nation.column("n_regionkey"),
                     value_set=pa.array(asia_rk, pa.int32()))
        ).column("n_nationkey").to_pylist()
    )

    cust = pq.read_table(
        _tbl(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    )
    cust = cust.filter(
        pc.is_in(cust.column("c_nationkey"),
                 value_set=pa.array(sorted(asia_nk), pa.int32()))
    ).rename_columns(["o_custkey", "c_nationkey"])

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t.column("o_orderdate"), lo),
                pc.less(t.column("o_orderdate"), hi),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    forders = broadcast_join(orders, cust, "o_custkey").map_batches(
        lambda t: t.select(["o_orderkey", "c_nationkey"]).rename_columns(
            ["l_orderkey", "c_nationkey"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    lineitem = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    joined = hash_join(
        lineitem, forders, "l_orderkey",
        left_cols=["l_suppkey", "l_extendedprice", "l_discount"],
        right_cols=["c_nationkey"],
    )

    supp = pq.read_table(
        _tbl(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    ).rename_columns(["l_suppkey", "s_nationkey"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.equal(
            t.column("s_nationkey").cast(pa.int32()),
            t.column("c_nationkey").cast(pa.int32()),
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
                    "n_nationkey": t.column("c_nationkey").cast(pa.int64()),
                    "revenue_cents": rev,
                }
            )
            .group_by("n_nationkey")
            .aggregate([("revenue_cents", "sum")])
            .rename_columns(["n_nationkey", "revenue_cents"])
        )

    rows = (
        broadcast_join(joined, supp, "l_suppkey")
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_nationkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .take_all()
    )
    t = _from_rows(
        rows, {"n_nationkey": pa.int64(), "revenue_cents": pa.int64()}
    )
    names = _nation_names(sf_dir)
    t = t.append_column(
        "n_name",
        pa.array([names[k] for k in t.column("n_nationkey").to_pylist()],
                 pa.string()),
    )
    return t.select(["n_name", "revenue_cents"]).sort_by(
        [("revenue_cents", "descending"), ("n_name", "ascending")]
    )


ORACLE_TPCH_Q5 = """
SELECT n_name,
       CAST(sum(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name ORDER BY revenue_cents DESC, n_name
"""


def q_tpch_q8(sf_dir: str) -> pa.Table:
    """TPC-H Q8-shaped market share: among lineitems ordered by
    AMERICA-region customers over two years, the revenue fraction
    supplied by one target nation, per order year.  Year extraction is
    Arrow `pc.year` (mirrors DuckDB `year()`); cents are exact int64
    on both sides so only the final share division is float."""
    from ...functions.joins import broadcast_join, hash_join

    TARGET = "NATION_12"
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1998-01-01", "us"))

    nation = pq.read_table(
        _tbl(sf_dir, "nation"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    region = pq.read_table(
        _tbl(sf_dir, "region"), columns=["r_regionkey", "r_name"]
    )
    am_rk = region.filter(
        pc.equal(region.column("r_name"), "AMERICA")
    ).column("r_regionkey").to_pylist()
    am_nk = nation.filter(
        pc.is_in(nation.column("n_regionkey"),
                 value_set=pa.array(am_rk, pa.int32()))
    ).column("n_nationkey").to_pylist()
    target_nk = set(
        nation.filter(pc.equal(nation.column("n_name"), TARGET))
        .column("n_nationkey").to_pylist()
    )

    cust = pq.read_table(
        _tbl(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    )
    am_ck = cust.filter(
        pc.is_in(cust.column("c_nationkey"),
                 value_set=pa.array(am_nk, pa.int32()))
    ).select(["c_custkey"]).rename_columns(["o_custkey"])

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t.column("o_orderdate"), lo),
                pc.less(t.column("o_orderdate"), hi),
            )
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    forders = broadcast_join(orders, am_ck, "o_custkey", how="semi") \
        .map_batches(
            lambda t: pa.table(
                {
                    "l_orderkey": t.column("o_orderkey"),
                    "yr": pc.year(t.column("o_orderdate")).cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    lineitem = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    joined = hash_join(
        lineitem, forders, "l_orderkey",
        left_cols=["l_suppkey", "l_extendedprice", "l_discount"],
        right_cols=["yr"],
    )

    supp = pq.read_table(
        _tbl(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    ).rename_columns(["l_suppkey", "s_nationkey"])
    tk = pa.array(sorted(target_nk), pa.int32())

    def partial(t: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
        )
        is_t = pc.is_in(t.column("s_nationkey").cast(pa.int32()),
                        value_set=tk)
        target_rev = pc.if_else(is_t, rev, pa.scalar(0, pa.int64()))
        return (
            pa.table(
                {
                    "yr": t.column("yr"),
                    "target_cents": target_rev,
                    "total_cents": rev,
                }
            )
            .group_by("yr")
            .aggregate([("target_cents", "sum"), ("total_cents", "sum")])
            .rename_columns(["yr", "target_cents", "total_cents"])
        )

    rows = (
        broadcast_join(joined, supp, "l_suppkey")
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("yr")
        .aggregate(
            Sum("target_cents", alias_name="target_cents"),
            Sum("total_cents", alias_name="total_cents"),
        )
        .take_all()
    )
    t = _from_rows(
        rows,
        {"yr": pa.int64(), "target_cents": pa.int64(),
         "total_cents": pa.int64()},
    ).sort_by("yr")
    share = pc.divide(
        t.column("target_cents").cast(pa.float64()),
        t.column("total_cents").cast(pa.float64()),
    )
    return t.append_column("mkt_share", share)


ORACLE_TPCH_Q8 = """
WITH j AS (
  SELECT year(o_orderdate) AS yr,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS rev,
         (SELECT n_name FROM nation n2
          WHERE n2.n_nationkey = s.s_nationkey) = 'NATION_12' AS is_t
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE r.r_name = 'AMERICA'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01'
)
SELECT yr,
       CAST(sum(CASE WHEN is_t THEN rev ELSE 0 END) AS BIGINT)
         AS target_cents,
       CAST(sum(rev) AS BIGINT) AS total_cents,
       CAST(sum(CASE WHEN is_t THEN rev ELSE 0 END) AS DOUBLE)
         / CAST(sum(rev) AS DOUBLE) AS mkt_share
FROM j GROUP BY yr ORDER BY yr
"""


def q_tpch_q10(sf_dir: str) -> pa.Table:
    """TPC-H Q10-shaped returned-item report: top 20 customers by
    revenue lost to returns (l_returnflag = 'R') against orders placed
    in one quarter.  One bucketed exchange (lineitem × quarter
    orders), per-batch partials per custkey, exact keyed fold, then
    per-block partial top-20 so the driver merges ≤ 20 rows per
    block; name/acctbal/nation attach to the 20 survivors only."""
    from ...functions.joins import hash_join
    from ...functions.window import keyed_window, segment_starts

    K = 20
    lo = pa.scalar(np.datetime64("1996-10-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t.column("o_orderdate"), lo),
                pc.less(t.column("o_orderdate"), hi),
            )
        ).select(["o_orderkey", "o_custkey"]).rename_columns(
            ["l_orderkey", "o_custkey"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    lineitem = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: t.filter(
            pc.equal(t.column("l_returnflag"), "R")
        ).drop_columns(["l_returnflag"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = hash_join(
        lineitem, orders, "l_orderkey",
        left_cols=["l_extendedprice", "l_discount"],
        right_cols=["o_custkey"],
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
        )
        return (
            pa.table(
                {"c_custkey": t.column("o_custkey"), "revenue_cents": rev}
            )
            .group_by("c_custkey")
            .aggregate([("revenue_cents", "sum")])
            .rename_columns(["c_custkey", "revenue_cents"])
        )

    partials = joined.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        key = g.column("c_custkey").to_numpy(zero_copy_only=False)
        rev = g.column("revenue_cents").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, rev = key[order], rev[order]
        starts = np.flatnonzero(segment_starts(key))
        t = pa.table(
            {
                "c_custkey": pa.array(key[starts], pa.int64()),
                "revenue_cents": pa.array(
                    np.add.reduceat(rev, starts), pa.int64()
                ),
            }
        )
        return t.sort_by(
            [("revenue_cents", "descending"), ("c_custkey", "ascending")]
        ).slice(0, K)

    rows = keyed_window(partials, "c_custkey", fold).take_all()
    t = _from_rows(
        rows, {"c_custkey": pa.int64(), "revenue_cents": pa.int64()}
    ).sort_by(
        [("revenue_cents", "descending"), ("c_custkey", "ascending")]
    ).slice(0, K)

    cust = pq.read_table(
        _tbl(sf_dir, "customer"),
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )
    t = t.join(cust, keys=["c_custkey"], join_type="left outer")
    names = _nation_names(sf_dir)
    t = t.append_column(
        "n_name",
        pa.array(
            [names[k] for k in t.column("c_nationkey").to_pylist()],
            pa.string(),
        ),
    )
    return t.select(
        ["c_custkey", "c_name", "revenue_cents", "c_acctbal", "n_name"]
    ).sort_by(
        [("revenue_cents", "descending"), ("c_custkey", "ascending")]
    )


ORACLE_TPCH_Q10 = """
WITH r AS (
  SELECT o_custkey AS c_custkey,
         CAST(sum(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-10-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01'
  GROUP BY 1
  ORDER BY revenue_cents DESC, c_custkey LIMIT 20
)
SELECT r.c_custkey, c.c_name, r.revenue_cents, c.c_acctbal, n.n_name
FROM r JOIN customer c ON r.c_custkey = c.c_custkey
       JOIN nation n   ON c.c_nationkey = n.n_nationkey
ORDER BY r.revenue_cents DESC, r.c_custkey
"""


def q_tpch_q13(sf_dir: str) -> pa.Table:
    """TPC-H Q13-shaped order-count distribution: how many customers
    placed exactly k qualifying orders (priority 2-HIGH), INCLUDING
    the zero bucket.  No customer×orders join at all: qualifying
    per-customer counts fold exactly (partials → keyed sum), the
    histogram over counts is another two-level fold, and the zero
    bucket is total_customers − customers_with_any — the algebraic
    identity the LEFT JOIN oracle spells out row by row."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("o_orderpriority"), "2-HIGH"))
        return (
            pa.table({"c_custkey": t.column("o_custkey")})
            .group_by("c_custkey")
            .aggregate([("c_custkey", "count")])
            .rename_columns(["c_custkey", "n"])
        )

    counts = (
        orders.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("c_custkey")
        .aggregate(Sum("n", alias_name="c_count"))
    )

    def hist(t: pa.Table) -> pa.Table:
        return (
            pa.table({"c_count": t.column("c_count")})
            .group_by("c_count")
            .aggregate([("c_count", "count")])
            .rename_columns(["c_count", "custdist"])
        )

    rows = (
        counts.map_batches(hist, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
        .take_all()
    )
    t = _from_rows(
        rows, {"c_count": pa.int64(), "custdist": pa.int64()}
    )
    n_cust = _read(sf_dir, "customer", ["c_custkey"]).count()
    zeros = n_cust - int(pc.sum(t.column("custdist")).as_py() or 0)
    if zeros > 0:
        t = pa.concat_tables(
            [t, pa.table({"c_count": pa.array([0], pa.int64()),
                          "custdist": pa.array([zeros], pa.int64())})]
        )
    return t.sort_by(
        [("custdist", "descending"), ("c_count", "descending")]
    )


ORACLE_TPCH_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority = '2-HIGH'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q15(sf_dir: str) -> pa.Table:
    """TPC-H Q15-shaped top supplier: the supplier(s) with maximum
    revenue in one quarter.  Per-supplier revenue folds exactly
    through one keyed exchange; each output block then emits only its
    rows tying the BLOCK max, so the driver merges ≤ blocks × ties
    rows and takes the global max — never the full supplier list."""
    from ...functions.window import keyed_window, segment_starts

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1996-04-01", "us"))

    lineitem = _read(
        sf_dir, "lineitem",
        ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t.column("l_shipdate"), lo),
                pc.less(t.column("l_shipdate"), hi),
            )
        ).drop_columns(["l_shipdate"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount")),
            )
        )
        return (
            pa.table(
                {"s_suppkey": t.column("l_suppkey"), "total_cents": rev}
            )
            .group_by("s_suppkey")
            .aggregate([("total_cents", "sum")])
            .rename_columns(["s_suppkey", "total_cents"])
        )

    partials = lineitem.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        key = g.column("s_suppkey").to_numpy(zero_copy_only=False)
        rev = g.column("total_cents").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, rev = key[order], rev[order]
        starts = np.flatnonzero(segment_starts(key))
        total = np.add.reduceat(rev, starts)
        keep = total == total.max() if len(total) else slice(0)
        return pa.table(
            {
                "s_suppkey": pa.array(key[starts][keep], pa.int64()),
                "total_cents": pa.array(total[keep], pa.int64()),
            }
        )

    rows = keyed_window(partials, "s_suppkey", fold).take_all()
    t = _from_rows(
        rows, {"s_suppkey": pa.int64(), "total_cents": pa.int64()}
    )
    mx = pc.max(t.column("total_cents"))
    t = t.filter(pc.equal(t.column("total_cents"), mx))
    supp = pq.read_table(
        _tbl(sf_dir, "supplier"), columns=["s_suppkey", "s_name"]
    )
    return t.join(supp, keys=["s_suppkey"], join_type="left outer") \
        .select(["s_suppkey", "s_name", "total_cents"]).sort_by("s_suppkey")


ORACLE_TPCH_Q15 = """
WITH r AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(sum(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT r.s_suppkey, s.s_name, r.total_cents
FROM r JOIN supplier s ON r.s_suppkey = s.s_suppkey
WHERE r.total_cents = (SELECT max(total_cents) FROM r)
ORDER BY r.s_suppkey
"""


def q_tpch_q22(sf_dir: str) -> pa.Table:
    """TPC-H Q22-shaped idle-rich report: customers whose balance
    beats the positive-balance average but who placed no order since
    1999, aggregated per nation.  The average gate is an integer
    cross-multiply (cents × count > total-cents) so the threshold has
    no float boundary; 'no recent order' is the bucketed anti-join;
    partials collapse to ≤ 25 nation rows per batch."""
    from ...functions.joins import hash_join

    cutoff = pa.scalar(np.datetime64("1999-01-01", "us"))

    customer = _read(
        sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]
    )

    def bal_partial(t: pa.Table) -> pa.Table:
        pos = t.filter(pc.greater(t.column("c_acctbal"), 0.0))
        return pa.table(
            {
                "tot": pa.array(
                    [int(pc.sum(_cents(pos.column("c_acctbal"))).as_py()
                         or 0)], pa.int64()
                ),
                "cnt": pa.array([pos.num_rows], pa.int64()),
            }
        )

    agg = customer.map_batches(
        bal_partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(Sum("tot", alias_name="tot"), Sum("cnt", alias_name="cnt"))
    tot, cnt = int(agg["tot"] or 0), int(agg["cnt"] or 0)

    def rich(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("c_acctbal"))
        keep = pc.greater(
            pc.multiply(cents, pa.scalar(cnt, pa.int64())),
            pa.scalar(tot, pa.int64()),
        )
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_nationkey": t.column("c_nationkey").cast(pa.int64()),
                "cents": cents,
            }
        ).filter(keep)

    rich_ds = customer.map_batches(
        rich, batch_format="pyarrow", zero_copy_batch=True
    )
    recent = _read(
        sf_dir, "orders", ["o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.greater_equal(t.column("o_orderdate"), cutoff)
        ).select(["o_custkey"]).rename_columns(["c_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    idle = hash_join(
        rich_ds, recent, "c_custkey",
        left_cols=["c_custkey", "c_nationkey", "cents"],
        right_cols=[],
        how="anti",
    )

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "n_nationkey": t.column("c_nationkey"),
                    "numcust": pa.array(
                        np.ones(t.num_rows, dtype=np.int64)
                    ),
                    "acctbal_cents": t.column("cents"),
                }
            )
            .group_by("n_nationkey")
            .aggregate([("numcust", "sum"), ("acctbal_cents", "sum")])
            .rename_columns(["n_nationkey", "numcust", "acctbal_cents"])
        )

    rows = (
        idle.map_batches(partial, batch_format="pyarrow")
        .groupby("n_nationkey")
        .aggregate(
            Sum("numcust", alias_name="numcust"),
            Sum("acctbal_cents", alias_name="acctbal_cents"),
        )
        .take_all()
    )
    t = _from_rows(
        rows,
        {"n_nationkey": pa.int64(), "numcust": pa.int64(),
         "acctbal_cents": pa.int64()},
    )
    names = _nation_names(sf_dir)
    t = t.append_column(
        "n_name",
        pa.array([names[k] for k in t.column("n_nationkey").to_pylist()],
                 pa.string()),
    )
    return t.select(["n_name", "numcust", "acctbal_cents"]).sort_by("n_name")


ORACLE_TPCH_Q22 = """
WITH s AS (
  SELECT CAST(sum(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS tot,
         count(*) AS cnt
  FROM customer WHERE c_acctbal > 0
),
rich AS (
  SELECT c_custkey, c_nationkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer, s
  WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * cnt > tot
)
SELECT n_name, count(*) AS numcust,
       CAST(sum(cents) AS BIGINT) AS acctbal_cents
FROM rich JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = rich.c_custkey
    AND o.o_orderdate >= TIMESTAMP '1999-01-01'
)
GROUP BY n_name ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# wave 11: rolling-window distinct (WAU), embedding centroids, corpus
#          balance (Gini), global percentile rank
# ---------------------------------------------------------------------------


def q_rolling_wau(sf_dir: str) -> pa.Table:
    """7-day rolling distinct active users (WAU) per observed day —
    the windowed COUNT(DISTINCT) the oracle writes as a 7-day
    self-join.  Per-user presence days fold through ONE keyed
    exchange; inside the bucket each user's day list collapses to
    merged coverage intervals (runs with gaps ≤ 6 extend, a user
    covers [day, day+6] per presence), which emit ±1 boundary deltas.
    Only O(distinct boundary days) rows reach the driver, which
    prefix-sums the step function and samples it at observed days —
    never a per-(day, user) pair table."""
    from ...functions.window import keyed_window, segment_starts

    DAY_US = 86_400_000_000
    W = 7  # window covers [d-6, d]
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(
            t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
            pa.scalar(DAY_US, pa.int64()),
        )
        return (
            pa.table({"user_id": t.column("user_id"), "day": day})
            .group_by(["user_id", "day"])
            .aggregate([])
        )

    presence = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        day = g.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        ustart = segment_starts(uid)
        # drop duplicate (user, day) rows surviving across batches
        dup = ~ustart.copy()
        dup[1:] &= day[1:] == day[:-1]
        uid, day, ustart = uid[~dup], day[~dup], ustart[~dup]
        # a new coverage interval starts at a user boundary or a gap > W-1
        newint = ustart.copy()
        newint[1:] |= (day[1:] - day[:-1]) > (W - 1)
        istart = np.flatnonzero(newint)
        iend = np.append(istart[1:], len(day)) - 1
        start_day = day[istart]
        end_day = day[iend] + (W - 1)  # inclusive
        return pa.table(
            {
                "day": pa.array(
                    np.concatenate([start_day, end_day + 1]), pa.int64()
                ),
                "delta": pa.array(
                    np.concatenate(
                        [
                            np.ones(len(istart), dtype=np.int64),
                            -np.ones(len(istart), dtype=np.int64),
                        ]
                    )
                ),
            }
        )

    deltas = (
        keyed_window(presence, "user_id", fold)
        .groupby("day")
        .aggregate(Sum("delta", alias_name="delta"))
        .take_all()
    )
    dt = _from_rows(
        deltas, {"day": pa.int64(), "delta": pa.int64()}
    ).sort_by("day")
    bdays = dt.column("day").to_numpy(zero_copy_only=False)
    steps = np.cumsum(dt.column("delta").to_numpy(zero_copy_only=False))

    observed = (
        presence.map_batches(
            lambda t: t.group_by("day").aggregate([]),
            batch_format="pyarrow",
        )
        .groupby("day")
        .aggregate(Count(alias_name="_n"))
        .take_all()
    )
    ot = _from_rows(
        observed, {"day": pa.int64(), "_n": pa.int64()}
    ).sort_by("day")
    odays = ot.column("day").to_numpy(zero_copy_only=False)
    idx = np.searchsorted(bdays, odays, side="right") - 1
    wau = np.where(idx >= 0, steps[np.maximum(idx, 0)], 0)
    return pa.table(
        {
            "day": pa.array(odays, pa.int64()),
            "wau": pa.array(wau.astype(np.int64), pa.int64()),
        }
    )


ORACLE_ROLLING_WAU = """
WITH ed AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
days AS (SELECT DISTINCT day FROM ed)
SELECT d.day, count(DISTINCT e.user_id) AS wau
FROM days d JOIN ed e ON e.day BETWEEN d.day - 6 AND d.day
GROUP BY d.day ORDER BY d.day
"""


def q_centroid_per_label(sf_dir: str) -> pa.Table:
    """Per-label embedding centroid in exact integer micro-units —
    the class-prototype primitive behind SemDeDup-style pruning and
    embedding drift monitors.  Each element is rounded once to int64
    micro-units (mirrored in the oracle), so the distributed sum is
    order-independent; per-batch partials are ≤ labels × dims rows and
    only the final mean division is float."""
    ds = _read(sf_dir, "embeddings", ["embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        emb = t.column("embedding")
        if emb.num_chunks > 0:
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb)
        m = _micro(flat).to_numpy(zero_copy_only=False)
        lab = t.column("label").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = t.num_rows
        d = len(m) // max(n, 1)
        key = np.repeat(lab, d) * d + np.tile(
            np.arange(d, dtype=np.int64), n
        )
        order = np.argsort(key, kind="stable")
        key_s, m_s = key[order], m[order]
        starts = np.flatnonzero(
            np.concatenate(([True], key_s[1:] != key_s[:-1]))
            if len(key_s)
            else np.array([], dtype=bool)
        )
        uk = key_s[starts]
        return pa.table(
            {
                "label": pa.array(uk // d, pa.int64()),
                "dim": pa.array(uk % d, pa.int64()),
                "sum_micro": pa.array(
                    np.add.reduceat(m_s, starts) if len(starts) else [],
                    pa.int64(),
                ),
                "n_vecs": pa.array(
                    np.diff(np.append(starts, len(key_s))), pa.int64()
                ),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["label", "dim"])
        .aggregate(
            Sum("sum_micro", alias_name="sum_micro"),
            Sum("n_vecs", alias_name="n_vecs"),
        )
        .take_all()
    )
    t = _from_rows(
        rows,
        {"label": pa.int64(), "dim": pa.int64(), "sum_micro": pa.int64(),
         "n_vecs": pa.int64()},
    ).sort_by([("label", "ascending"), ("dim", "ascending")])
    mean = pc.divide(
        t.column("sum_micro").cast(pa.float64()),
        t.column("n_vecs").cast(pa.float64()),
    )
    return t.append_column("centroid_micro", mean)


ORACLE_CENTROID = """
WITH u AS (
  SELECT CAST(label AS BIGINT) AS label, u.i - 1 AS dim,
         CAST(ROUND(CAST(u.e AS DOUBLE) * 1000000.0) AS BIGINT) AS m
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS e,
                       unnest(generate_series(1, len(embedding))) AS i) u
)
SELECT label, dim, CAST(sum(m) AS BIGINT) AS sum_micro,
       count(*) AS n_vecs,
       CAST(sum(m) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS centroid_micro
FROM u GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_user_activity_gini(sf_dir: str) -> pa.Table:
    """Gini coefficient of per-user event counts — the corpus-balance
    diagnostic ('is 1% of users 90% of the data').  Per-user counts
    fold exactly; a second fold histograms the counts (O(distinct
    count values) rows); the driver evaluates the rank-weighted sum in
    closed form per histogram cell with Python-int exactness — the
    identity Σᵢ i·x₍ᵢ₎ = Σ_v v·(f·o + f(f+1)/2), which is tie-order
    invariant, so no global sort and no O(users) driver state."""
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "events", ["user_id"])

    def partial(t: pa.Table) -> pa.Table:
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
        total = np.add.reduceat(n, starts)
        vals, freq = np.unique(total, return_counts=True)
        return pa.table(
            {
                "n": pa.array(vals, pa.int64()),
                "freq": pa.array(freq, pa.int64()),
            }
        )

    rows = (
        keyed_window(partials, "user_id", fold)
        .groupby("n")
        .aggregate(Sum("freq", alias_name="freq"))
        .take_all()
    )
    t = _from_rows(rows, {"n": pa.int64(), "freq": pa.int64()}).sort_by("n")
    vals = t.column("n").to_pylist()
    freq = t.column("freq").to_pylist()
    nu = int(sum(freq))
    tot = int(sum(v * f for v, f in zip(vals, freq)))
    s = 0
    offset = 0  # users with strictly smaller counts
    for v, f in zip(vals, freq):
        s += v * (f * offset + f * (f + 1) // 2)
        offset += f
    gini = (
        2.0 * np.float64(s) / (np.float64(nu) * np.float64(tot))
        - (np.float64(nu) + 1.0) / np.float64(nu)
        if nu and tot
        else float("nan")
    )
    return pa.table(
        {
            "n_users": pa.array([nu], pa.int64()),
            "total_events": pa.array([tot], pa.int64()),
            "gini": pa.array([float(gini)], pa.float64()),
        }
    )


ORACLE_GINI = """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
s AS (
  SELECT n, row_number() OVER (ORDER BY n, user_id) AS i FROM c
)
SELECT count(*) AS n_users, CAST(sum(n) AS BIGINT) AS total_events,
       2.0 * CAST(sum(i * n) AS DOUBLE)
           / (CAST(count(*) AS DOUBLE) * CAST(sum(n) AS DOUBLE))
         - (CAST(count(*) AS DOUBLE) + 1.0) / CAST(count(*) AS DOUBLE)
         AS gini
FROM s
"""


def q_user_value_percent_rank(sf_dir: str) -> pa.Table:
    """Global percent_rank of each user's total spend — 'which
    percentile is this user in'.  Totals fold exactly per user; the
    global rank then uses the range-partitioned two-pass scan (the
    ordered_prefix_sum shape): pass 1 counts rows per value-range (the
    driver holds R integers), pass 2 ranks each row inside its range
    by local searchsorted plus the range's exclusive offset.  Equal
    totals always share a range, so SQL rank()/percent_rank() tie
    semantics are exact — no global sort."""
    from ...functions.window import default_num_buckets, keyed_window, \
        segment_starts

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("value"))
        return (
            pa.table({"user_id": t.column("user_id"), "cents": cents})
            .group_by("user_id")
            .aggregate([("cents", "sum")])
            .rename_columns(["user_id", "total_cents"])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        c = g.column("total_cents").to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid, c = uid[order], c[order]
        starts = np.flatnonzero(segment_starts(uid))
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "total_cents": pa.array(
                    np.add.reduceat(c, starts), pa.int64()
                ),
            }
        )

    totals = keyed_window(partials, "user_id", fold)

    agg = totals.aggregate(
        Min("total_cents", alias_name="lo"),
        Max("total_cents", alias_name="hi"),
    )
    lo, hi = int(agg["lo"]), int(agg["hi"])
    R = default_num_buckets()
    span = max(hi - lo, 1)

    def tag(t: pa.Table) -> pa.Table:
        v = t.column("total_cents").to_numpy(zero_copy_only=False)
        rid = np.clip((v - lo) * R // (span + 1), 0, R - 1)
        return t.append_column("__r", pa.array(rid.astype(np.int64)))

    ranged = totals.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True
    )
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
    rids = ct.column("__r").to_numpy(zero_copy_only=False)
    cs = ct.column("c").to_numpy(zero_copy_only=False)
    n_total = int(cs.sum())
    offsets_arr = np.zeros(R, dtype=np.int64)
    offsets_arr[rids] = cs
    offsets_arr = np.concatenate(([0], np.cumsum(offsets_arr)[:-1]))
    offsets = {int(r): int(offsets_arr[r]) for r in range(R)}
    denom = max(n_total - 1, 1)

    def rank_range(g: pa.Table) -> pa.Table:
        # a hash bucket may hold several range ids — rank each range
        # segment independently against its own exclusive offset
        rid = g.column("__r").to_numpy(zero_copy_only=False)
        v = g.column("total_cents").to_numpy(zero_copy_only=False)
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, rid))
        rid, v, uid = rid[order], v[order], uid[order]
        starts = np.flatnonzero(segment_starts(rid))
        ends = np.append(starts[1:], len(rid))
        rank = np.empty(len(v), dtype=np.int64)
        for s, e in zip(starts, ends):  # ≤ R/num_buckets segments
            sv = v[s:e]  # already sorted within the segment
            rank[s:e] = (
                offsets[int(rid[s])]
                + np.searchsorted(sv, sv, side="left")
                + 1
            )
        pct = (rank - 1).astype(np.float64) / np.float64(denom)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "total_cents": pa.array(v, pa.int64()),
                "pct_rank": pa.array(pct, pa.float64()),
            }
        )

    return keyed_window(ranged, "__r", rank_range).sort("user_id")


ORACLE_PCT_RANK = """
WITH t AS (
  SELECT user_id,
         CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM events GROUP BY 1
)
SELECT user_id, total_cents,
       percent_rank() OVER (ORDER BY total_cents) AS pct_rank
FROM t ORDER BY user_id
"""



# ---------------------------------------------------------------------------
# wave 15: corpus forensics + attribution
# ---------------------------------------------------------------------------

_NOVELTY_W = 3


def _distinct_shingle_rows(t: pa.Table, W: int) -> pa.Table:
    """(doc_id, shingle) rows of per-doc DISTINCT word W-shingles as
    STRINGS (SQL-mirrorable, unlike the hashed ``_doc_shingles``):
    tokenize + flatten once, join W shifted views in one
    binary_join_element_wise call, mask windows crossing doc
    boundaries, then one Arrow group_by for the per-doc distinct."""
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
    valid = parent[: n - W + 1] == parent[W - 1 :]
    doc = pc.take(
        t.column("doc_id"), pa.array(parent[: n - W + 1], pa.int64())
    )
    out = pa.table({"doc_id": doc, "shingle": sh}).filter(pa.array(valid))
    return out.group_by(["doc_id", "shingle"]).aggregate([])


def q_shingle_novelty_documents(sf_dir: str) -> ray.data.Dataset:
    """Per-document shingle novelty: of each doc's distinct word
    3-shingles, how many occur for the FIRST time in this doc (corpus
    first occurrence = min doc_id over the shingle)?  The redundancy-
    growth statistic of a training corpus — a stream whose novel
    fraction collapses is re-crawling itself.

    Distributed: distinct (doc, shingle) rows → shingle-keyed bucket
    exchange (each shingle's global min is computed in exactly ONE
    bucket, and per-doc totals are additive across buckets because a
    (doc, shingle) row lands in exactly one) → per-doc partials →
    doc-keyed sum.  No shingle string ever reaches the driver; the
    per-bucket pass is one Arrow sort + shifted-compare, no Python
    loop over runs."""
    from ...functions.window import keyed_window, segment_starts

    W = _NOVELTY_W
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def rows(t: pa.Table) -> pa.Table:
        return _distinct_shingle_rows(t, W)

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_shingles": pa.array([], pa.int64()),
                 "n_novel": pa.array([], pa.int64())}
            )
        g = g.sort_by(
            [("shingle", "ascending"), ("doc_id", "ascending")]
        )
        sh = g.column("shingle").combine_chunks()
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(doc)
        starts = np.ones(n, dtype=bool)
        if n > 1:
            starts[1:] = pc.not_equal(
                sh.slice(1), sh.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        novel_docs = doc[starts]  # run head = min doc_id of the shingle
        ud, uc = np.unique(doc, return_counts=True)
        nd, nc = np.unique(novel_docs, return_counts=True)
        nov = np.zeros(len(ud), np.int64)
        nov[np.searchsorted(ud, nd)] = nc
        return pa.table(
            {
                "doc_id": pa.array(ud, pa.int64()),
                "n_shingles": pa.array(uc.astype(np.int64), pa.int64()),
                "n_novel": pa.array(nov, pa.int64()),
            }
        )

    shingle_rows = ds.map_batches(
        rows, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = keyed_window(shingle_rows, "shingle", per_bucket)

    def fold(g: pa.Table) -> pa.Table:
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        ns = g.column("n_shingles").to_numpy(zero_copy_only=False)
        nv = g.column("n_novel").to_numpy(zero_copy_only=False)
        order = np.argsort(did, kind="stable")
        did, ns, nv = did[order], ns[order], nv[order]
        starts = np.flatnonzero(segment_starts(did))
        return pa.table(
            {
                "doc_id": pa.array(did[starts], pa.int64()),
                "n_shingles": pa.array(
                    np.add.reduceat(ns, starts).astype(np.int64), pa.int64()
                ),
                "n_novel": pa.array(
                    np.add.reduceat(nv, starts).astype(np.int64), pa.int64()
                ),
            }
        )

    return keyed_window(partials, "doc_id", fold).sort("doc_id")


ORACLE_SHINGLE_NOVELTY = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_extract_all(lower(text), '\w+'),
                     x -> length(x) > 0) AS ts
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS shingle
  FROM toks JOIN range(1, 4096) t(i) ON t.i <= greatest(0, len(ts) - 2)
), firsts AS (
  SELECT shingle, min(doc_id) AS md FROM sh GROUP BY 1
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN f.md = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel
FROM sh s JOIN firsts f ON s.shingle = f.shingle
GROUP BY 1 ORDER BY doc_id
"""


def q_dup_rate_per_source(sf_dir: str) -> ray.data.Dataset:
    """Exact-duplicate rate per source: per source, total docs and how
    many are non-canonical copies (canonical = corpus-wide min doc_id
    per text sha) — the per-feed quality dial a crawl operator watches.

    Distributed: per-batch (sha, source) partials (min id + count) →
    sha-keyed bucket exchange → per-bucket attribution (the global-min
    holder is decided inside the single bucket that owns the sha) →
    tiny per-source sums.  All run math is reduceat; the source
    grouping inside a bucket is Arrow group_by."""
    from ...functions.dedup import add_text_sha
    from ...functions.window import keyed_window, segment_starts

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        t = add_text_sha(t)
        return (
            t.select(["text_sha256", "source", "doc_id"])
            .group_by(["text_sha256", "source"])
            .aggregate([("doc_id", "min"), ("doc_id", "count")])
            .rename_columns(["text_sha256", "source", "min_id", "cnt"])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"source": pa.array([], pa.string()),
                 "n_docs": pa.array([], pa.int64()),
                 "n_dups": pa.array([], pa.int64())}
            )
        # combine batch partials of the same (sha, source) first
        g = (
            g.group_by(["text_sha256", "source"])
            .aggregate([("min_id", "min"), ("cnt", "sum")])
            .rename_columns(["text_sha256", "source", "min_id", "cnt"])
            .sort_by([("text_sha256", "ascending"), ("min_id", "ascending")])
        )
        sha = g.column("text_sha256").combine_chunks()
        mid = g.column("min_id").to_numpy(zero_copy_only=False)
        cnt = g.column("cnt").to_numpy(zero_copy_only=False)
        n = len(mid)
        starts = np.ones(n, dtype=bool)
        if n > 1:
            starts[1:] = pc.not_equal(
                sha.slice(1), sha.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        sidx = np.flatnonzero(starts)
        run_id = np.cumsum(starts) - 1
        runmin = np.minimum.reduceat(mid, sidx)
        keeper = mid == runmin[run_id]  # exactly one row per run
        dups = cnt - keeper.astype(np.int64)
        return (
            pa.table(
                {
                    "source": g.column("source"),
                    "n_docs": pa.array(cnt.astype(np.int64), pa.int64()),
                    "n_dups": pa.array(dups.astype(np.int64), pa.int64()),
                }
            )
            .group_by("source")
            .aggregate([("n_docs", "sum"), ("n_dups", "sum")])
            .rename_columns(["source", "n_docs", "n_dups"])
        )

    bucketed = keyed_window(partials, "text_sha256", per_bucket)

    def fold(g: pa.Table) -> pa.Table:
        return (
            g.group_by("source")
            .aggregate([("n_docs", "sum"), ("n_dups", "sum")])
            .rename_columns(["source", "n_docs", "n_dups"])
        )

    return keyed_window(bucketed, "source", fold).sort("source")


ORACLE_DUP_RATE_SOURCE = """
WITH s AS (
  SELECT doc_id, source, sha256(text) AS sha FROM documents
), m AS (
  SELECT sha, min(doc_id) AS md FROM s GROUP BY 1
)
SELECT s.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN s.doc_id <> m.md THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dups
FROM s JOIN m ON s.sha = m.sha
GROUP BY 1 ORDER BY source
"""


def q_cross_source_overlap(sf_dir: str) -> pa.Table:
    """Cross-source contamination matrix: for every source pair, the
    number of distinct text shas present in BOTH — which feeds are
    re-crawling each other.  Distributed: distinct (sha, source) rows
    → sha-keyed buckets → per-bucket source BITMASKS per sha
    (bitwise_or.reduceat — sources are a tiny set, runs are never
    looped) → mask histogram → pairs expanded per distinct mask only.
    Driver sees ≤ buckets × sourcepairs rows."""
    from ...functions.dedup import add_text_sha
    from ...functions.window import keyed_window

    ds = _read(sf_dir, "documents", ["text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        t = add_text_sha(t)
        return (
            t.select(["text_sha256", "source"])
            .group_by(["text_sha256", "source"])
            .aggregate([])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"source_a": pa.array([], pa.string()),
             "source_b": pa.array([], pa.string()),
             "n_shared": pa.array([], pa.int64())}
        )
        if g.num_rows == 0:
            return empty
        g = (
            g.group_by(["text_sha256", "source"])
            .aggregate([])
            .sort_by(
                [("text_sha256", "ascending"), ("source", "ascending")]
            )
        )
        sha = g.column("text_sha256").combine_chunks()
        src = np.asarray(g.column("source").to_pylist(), dtype=object)
        n = len(src)
        u, inv = np.unique(src, return_inverse=True)
        starts = np.ones(n, dtype=bool)
        if n > 1:
            starts[1:] = pc.not_equal(
                sha.slice(1), sha.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        sidx = np.flatnonzero(starts)
        mask = np.left_shift(np.uint64(1), inv.astype(np.uint64))
        runmask = np.bitwise_or.reduceat(mask, sidx)
        um, uc = np.unique(runmask, return_counts=True)
        out_a, out_b, out_n = [], [], []
        for m, c in zip(um, uc):  # ≤ 2^|sources| distinct masks, tiny
            members = u[
                (m >> np.arange(len(u), dtype=np.uint64)) & np.uint64(1) == 1
            ]
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    out_a.append(members[i])
                    out_b.append(members[j])
                    out_n.append(int(c))
        if not out_a:
            return empty
        return pa.table(
            {
                "source_a": pa.array(out_a, pa.string()),
                "source_b": pa.array(out_b, pa.string()),
                "n_shared": pa.array(out_n, pa.int64()),
            }
        )

    out = keyed_window(partials, "text_sha256", per_bucket)
    tiny = _from_rows(
        out.take_all(),
        {"source_a": pa.string(), "source_b": pa.string(),
         "n_shared": pa.int64()},
    )
    return (
        tiny.group_by(["source_a", "source_b"])
        .aggregate([("n_shared", "sum")])
        .rename_columns(["source_a", "source_b", "n_shared"])
        .sort_by([("source_a", "ascending"), ("source_b", "ascending")])
    )


ORACLE_CROSS_SOURCE = """
WITH s AS (
  SELECT DISTINCT source, sha256(text) AS sha FROM documents
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM s a JOIN s b ON a.sha = b.sha AND a.source < b.source
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_session_length_histogram(sf_dir: str) -> ray.data.Dataset:
    """Distribution of session sizes (events per 30-min-gap session):
    the shape statistic behind engagement dashboards and the sanity
    check on any sessionizer change.  Composes the sessionization
    pipeline with a two-level count fold — the exchange carries one
    row per (n_events, block), never per session."""
    from ...functions.window import keyed_window, segment_starts

    sess = q_session_windows(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        return (
            t.select(["n_events"])
            .group_by("n_events")
            .aggregate([("n_events", "count")])
            .rename_columns(["n_events", "n_sessions"])
        )

    partials = sess.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        k = g.column("n_events").to_numpy(zero_copy_only=False)
        c = g.column("n_sessions").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, c = k[order], c[order]
        starts = np.flatnonzero(segment_starts(k))
        return pa.table(
            {
                "n_events": pa.array(k[starts], pa.int64()),
                "n_sessions": pa.array(
                    np.add.reduceat(c, starts).astype(np.int64), pa.int64()
                ),
            }
        )

    return keyed_window(partials, "n_events", fold).sort("n_events")


ORACLE_SESSION_HIST = f"""
SELECT n_events, CAST(count(*) AS BIGINT) AS n_sessions
FROM ({ORACLE_SESSIONS}) GROUP BY 1 ORDER BY n_events
"""


def q_daily_streaks_per_user(sf_dir: str) -> ray.data.Dataset:
    """Longest consecutive-active-day streak per user (plus total
    active days) — calendar gaps-and-islands, the retention metric
    every engagement product ships.  Distributed: per-batch distinct
    (user, day) → user-keyed buckets → one lexsort + re-distinct +
    run pass over ALL users of the bucket at once."""
    from ...functions.window import keyed_window

    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(
            t.column("ts").cast(pa.int64()), pa.scalar(DAY_US, pa.int64())
        )
        return (
            pa.table({"user_id": t.column("user_id"), "day": day})
            .group_by(["user_id", "day"])
            .aggregate([])
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        day = g.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        # re-distinct: the same (user, day) may arrive from many batches
        keep = np.ones(len(uid), dtype=bool)
        if len(uid) > 1:
            keep[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])
        uid, day = uid[keep], day[keep]
        n = len(uid)
        newseg = np.ones(n, dtype=bool)
        if n > 1:
            newseg[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1] + 1)
        sstart = np.flatnonzero(newseg)
        slen = np.diff(np.concatenate((sstart, [n])))
        suid = uid[sstart]
        ustart = np.flatnonzero(
            np.concatenate(([True], suid[1:] != suid[:-1]))
        ) if len(suid) else np.zeros(0, np.int64)
        if not len(suid):
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "n_active_days": pa.array([], pa.int64()),
                 "max_streak": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "user_id": pa.array(suid[ustart], pa.int64()),
                "n_active_days": pa.array(
                    np.add.reduceat(slen, ustart).astype(np.int64),
                    pa.int64(),
                ),
                "max_streak": pa.array(
                    np.maximum.reduceat(slen, ustart).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return keyed_window(partials, "user_id", fold).sort("user_id")


ORACLE_DAILY_STREAKS = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
  FROM events
), i AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS grp
  FROM d
), s AS (
  SELECT user_id, grp, count(*) AS len FROM i GROUP BY 1, 2
)
SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(max(len) AS BIGINT) AS max_streak
FROM s GROUP BY 1 ORDER BY user_id
"""


def q_first_touch_attribution(sf_dir: str) -> pa.Table:
    """First-touch attribution: each user's lifetime value (and the
    user count) attributed to the event type of their FIRST event
    (order by ts, event_id) — the acquisition-channel report.
    Distributed: per-batch per-user partials (first candidate +
    cents/count sums) → user-keyed merge (min-by-(ts, event_id) is
    associative) → per-type sums inside each bucket, so the driver
    sees ≤ buckets × types rows."""
    from ...functions.window import keyed_window

    ds = _read(
        sf_dir, "events", ["user_id", "ts", "event_id", "event_type", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        tus = (
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, tus, uid))
        uid_s, tus_s, eid_s = uid[order], tus[order], eid[order]
        ustart = np.ones(len(uid_s), dtype=bool)
        if len(uid_s) > 1:
            ustart[1:] = uid_s[1:] != uid_s[:-1]
        sidx = np.flatnonzero(ustart)
        ftype = pc.take(
            t.column("event_type"), pa.array(order[sidx], pa.int64())
        )
        return pa.table(
            {
                "user_id": pa.array(uid_s[sidx], pa.int64()),
                "f_tus": pa.array(tus_s[sidx], pa.int64()),
                "f_eid": pa.array(eid_s[sidx], pa.int64()),
                "f_type": ftype,
                "cents": pa.array(
                    np.add.reduceat(cents[order], sidx).astype(np.int64),
                    pa.int64(),
                ),
                "n": pa.array(
                    np.diff(np.concatenate((sidx, [len(uid_s)]))).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        tus = g.column("f_tus").to_numpy(zero_copy_only=False)
        eid = g.column("f_eid").to_numpy(zero_copy_only=False)
        cents = g.column("cents").to_numpy(zero_copy_only=False)
        nn = g.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, tus, uid))
        uid_s = uid[order]
        ustart = np.ones(len(uid_s), dtype=bool)
        if len(uid_s) > 1:
            ustart[1:] = uid_s[1:] != uid_s[:-1]
        sidx = np.flatnonzero(ustart)
        ftype = pc.take(
            g.column("f_type"), pa.array(order[sidx], pa.int64())
        )
        ucents = np.add.reduceat(cents[order], sidx)
        return (
            pa.table(
                {
                    "event_type": ftype,
                    "n_users": pa.array(
                        np.ones(len(sidx), np.int64), pa.int64()
                    ),
                    "sum_value_cents": pa.array(
                        ucents.astype(np.int64), pa.int64()
                    ),
                }
            )
            .group_by("event_type")
            .aggregate([("n_users", "sum"), ("sum_value_cents", "sum")])
            .rename_columns(["event_type", "n_users", "sum_value_cents"])
        )

    out = keyed_window(partials, "user_id", fold)
    tiny = _from_rows(
        out.take_all(),
        {"event_type": pa.string(), "n_users": pa.int64(),
         "sum_value_cents": pa.int64()},
    )
    return (
        tiny.group_by("event_type")
        .aggregate([("n_users", "sum"), ("sum_value_cents", "sum")])
        .rename_columns(["event_type", "n_users", "sum_value_cents"])
        .sort_by("event_type")
    )


ORACLE_FIRST_TOUCH = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
), u AS (
  SELECT user_id,
         sum(CAST(ROUND(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1
)
SELECT r.event_type,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(u.cents) AS BIGINT) AS sum_value_cents
FROM r JOIN u USING (user_id) WHERE rn = 1
GROUP BY 1 ORDER BY event_type
"""

