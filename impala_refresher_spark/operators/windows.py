"""Window functions (SURVEY.md §2C W1-W3): ranking, analytic
(lag/lead/first/last), and sliding frames.

Scale notes: a window shuffles once on ``partitionBy`` keys and sorts
within partitions. Skewed partition keys (one giant customer) are the
classic failure mode at 100 TB — AQE cannot split a single window
partition, so choose partition keys with bounded cardinality skew, or
pre-aggregate. Every ORDER BY here includes a unique tiebreak column
so rows-frame results are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from impala_refresher_spark.registry import query
from impala_refresher_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# W1 — ranking
# ---------------------------------------------------------------------------

@query(
    "window_ranking",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(row_number() OVER w AS INTEGER) AS rn,
           CAST(rank() OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS drnk,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# W2 — analytic: lag / lead / first_value / last_value
# ---------------------------------------------------------------------------

@query(
    "window_analytic",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: note last_value needs the full-partition frame explicitly —
    the default frame ends at CURRENT ROW in both engines."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
    )


# ---------------------------------------------------------------------------
# W3 — sliding frames (rows + range)
# ---------------------------------------------------------------------------

@query(
    "window_sliding",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
           ROUND(sum(l_quantity) OVER
             (PARTITION BY l_suppkey ORDER BY l_orderkey ASC, l_linenumber ASC, l_quantity ASC
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS qty_3row,
           ROUND(avg(l_quantity) OVER
             (PARTITION BY l_suppkey ORDER BY l_orderkey ASC, l_linenumber ASC, l_quantity ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS qty_running_avg
    FROM lineitem
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 rows-frame: 3-row moving sum + running average. The order-by
    key includes l_quantity as final tiebreak: (orderkey, linenumber)
    is not unique in the synthetic data, and remaining ties are rows
    identical in both sort key and aggregated value, so the frame
    output is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(
        F.col("l_orderkey").asc(), F.col("l_linenumber").asc(), F.col("l_quantity").asc()
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(F.sum("l_quantity").over(w.rowsBetween(-2, 0)), 2).alias("qty_3row"),
        F.round(F.avg("l_quantity").over(w.rowsBetween(W.unboundedPreceding, 0)), 4).alias(
            "qty_running_avg"
        ),
    )


@query(
    "window_range_frame",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal,
           CAST(count(*) OVER
             (PARTITION BY c_mktsegment ORDER BY c_acctbal
              RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS BIGINT) AS peers_within_500
    FROM customer
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 range-frame: value-based window (all rows whose acctbal is
    within 500 below mine). Range frames include peers, so ties don't
    break determinism."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal")).rangeBetween(-500, 0)
    return c.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.count("*").over(w).alias("peers_within_500"),
    )


# ---------------------------------------------------------------------------
# W1b — distribution functions: percent_rank / cume_dist
# ---------------------------------------------------------------------------

@query(
    "window_distribution",
    """
    SELECT s_suppkey, s_nationkey, s_acctbal,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cum_dist
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal ASC, s_suppkey ASC)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1b: relative-position analytics — percent_rank (rank-1)/(n-1)
    and cume_dist (rows <= current)/n within each partition. Same
    single-shuffle window plan as the ranking battery; both engines
    compute the identical closed-form ratios."""
    s = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").asc(), F.col("s_suppkey").asc())
    return s.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )
