"""UDF surface (SURVEY.md §2C X1-X3): vectorized Pandas UDF, grouped
UDAF via applyInPandas, and UDTF-shaped expansion (explode/posexplode).

Policy (100 TB): built-in functions first — every declared query
elsewhere in this engine is pure JVM. When Python is genuinely needed
the only acceptable shape is Arrow-batched (``pandas_udf`` /
``applyInPandas`` / ``mapInPandas``); row-at-a-time ``F.udf`` is
10-100x slower and appears here only in tests as a contrast case.
Each UDF query's oracle re-expresses the function in SQL, proving the
Python path computes exactly what the declarative form would.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from impala_refresher_spark.registry import query
from impala_refresher_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# X1 — vectorized (Arrow) scalar Pandas UDF
# ---------------------------------------------------------------------------

@F.pandas_udf(T.IntegerType())
def _token_count(text: pd.Series) -> pd.Series:
    """Whitespace token count — one Arrow batch per invocation.

    Nullable Int32 (capital I), not int32: a NULL text makes
    .str.len() NaN, and the plain-int cast CRASHES the whole batch
    ("cannot convert non-finite values") where the oracle's
    len(string_split(NULL, ' ')) quietly yields NULL — the extension
    dtype round-trips pd.NA through Arrow as a proper null (found by
    the NULL-injection property; fixtures are NULL-free)."""
    return text.str.split(" ").str.len().astype("Int32")


@query(
    "udf_pandas_token_count",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
    FROM documents
    """,
)
def udf_pandas_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: the Pandas UDF must agree with the SQL re-expression —
    the oracle is the declarative twin of the Python function."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", _token_count("text").alias("n_tokens"))


# ---------------------------------------------------------------------------
# X2 — UDAF via applyInPandas (grouped map with one-row output)
# ---------------------------------------------------------------------------

def _median_chars(pdf: pd.DataFrame) -> pd.DataFrame:
    # pd.isna guard: a group whose n_chars are ALL NULL medians to NaN,
    # which Arrow ships as a double NaN — the oracle's median() yields
    # NULL there; return None so both engines say NULL
    m = pdf["n_chars"].median()
    return pd.DataFrame(
        {
            "lang": [pdf["lang"].iloc[0]],
            "median_chars": [None if pd.isna(m) else float(m)],
        }
    )


@query(
    "udaf_median_chars",
    """
    SELECT lang, median(n_chars) AS median_chars
    FROM documents
    GROUP BY lang
    """,
)
def udaf_median_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: exact median per group — not a built-in aggregate in Spark
    (percentile_approx is the scale path); applyInPandas shuffles each
    group to one worker. Fine while groups fit in memory (languages
    do); for unbounded groups use percentile_approx instead."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("lang", "n_chars").groupBy("lang").applyInPandas(
        _median_chars, schema="lang string, median_chars double"
    )


# ---------------------------------------------------------------------------
# X3 — UDTF-shaped expansion: explode / posexplode
# ---------------------------------------------------------------------------

@query(
    "explode_tokens",
    """
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: explode (lateral view) + count — the word-count shape.
    Explode multiplies rows before the shuffle; project away every
    unneeded column first so the expansion is narrow."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


@query(
    "posexplode_tokens",
    """
    SELECT doc_id,
           CAST(generate_subscripts(toks, 1) - 1 AS INTEGER) AS pos,
           unnest(toks) AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 20)
    """,
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: posexplode keeps the ordinal — needed downstream for
    positional n-grams and shingling (operators/dedup.py)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


# ---------------------------------------------------------------------------
# X3b — true Python UDTF (table function), lateral-joined per input row
# ---------------------------------------------------------------------------

@F.udtf(returnType="pos: int, token: string, tok_chars: int")
class _TokenizeUdtf:
    """One input string → one row per token with ordinal and length.

    A real Python UDTF (not explode-shaped SQL): arbitrary Python may
    run per row and yield a variable number of rows. Row-at-a-time by
    nature, so the hot path elsewhere uses explode/posexplode; this
    exists to cover the UDTF API surface with an oracle-checked query.
    """

    def eval(self, text: str):
        for pos, tok in enumerate((text or "").split(" ")):
            yield pos, tok, len(tok)


@query(
    "udtf_tokenize",
    """
    SELECT doc_id,
           CAST(generate_subscripts(toks, 1) - 1 AS INTEGER) AS pos,
           unnest(toks) AS token,
           CAST(length(unnest(toks)) AS INTEGER) AS tok_chars
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 20)
    """,
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3b: the UDTF applied laterally to each document row — same
    shape as LATERAL VIEW / table-function joins in the Impala-family
    SQL surface the reference ecosystem exposes."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.lateralJoin(
        _TokenizeUdtf(F.col("text").outer())
    ).select("doc_id", "pos", "token", "tok_chars")


# ---------------------------------------------------------------------------
# X4 — cogrouped-map: applyInPandas over a cogroup (two-sided custom merge)
# ---------------------------------------------------------------------------

_RECONCILE_SCHEMA = (
    "custkey bigint, n_orders bigint, n_events bigint, "
    "total_spend double, total_event_value double"
)


def _reconcile(key, orders_tab, events_tab):
    """Per-key two-sided merge: the cogroup API hands BOTH groups for
    one key to Python together — the shape for custom reconciliation
    logic (ledger matching, entity resolution) that a join + aggregate
    can't express row-algebraically. Here the logic IS re-expressible
    (so the oracle can check it exactly); the value under test is the
    API path: one shuffle per side, Arrow both ways.

    r10: receives/returns ARROW tables (``applyInArrow``) instead of
    pandas DataFrames — same per-key semantics, but the per-key cost
    drops from two pandas-DataFrame constructions + one pandas→Arrow
    conversion to plain Arrow slices (guide §4.2: hand batches to
    native code; measured 2.5 s → 1.3 s warm at sf0.1, where the
    per-key boundary overhead × 15 k keys IS the query). The sums
    still go through the same float64 numpy fold as the pandas form
    (`to_pandas().sum()`), so every rounded value is bit-identical."""
    import pyarrow as pa

    osum = orders_tab.column("o_totalprice").to_pandas().sum() if orders_tab.num_rows else 0.0
    esum = events_tab.column("value").to_pandas().sum() if events_tab.num_rows else 0.0
    return pa.table(
        {
            "custkey": pa.array([key[0].as_py()], pa.int64()),
            "n_orders": pa.array([orders_tab.num_rows], pa.int64()),
            "n_events": pa.array([events_tab.num_rows], pa.int64()),
            "total_spend": pa.array([round(float(osum), 2)], pa.float64()),
            "total_event_value": pa.array([round(float(esum), 2)], pa.float64()),
        }
    )


@query(
    "cogroup_reconcile",
    """
    WITH o AS (
      SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(SUM(o_totalprice), 2) AS total_spend
      FROM orders GROUP BY o_custkey
    ),
    e AS (
      SELECT user_id AS custkey, CAST(COUNT(*) AS BIGINT) AS n_events,
             ROUND(SUM(value), 2) AS total_event_value
      FROM events GROUP BY user_id
    )
    SELECT COALESCE(o.custkey, e.custkey) AS custkey,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(e.n_events, 0) AS n_events,
           COALESCE(o.total_spend, 0.0) AS total_spend,
           COALESCE(e.total_event_value, 0.0) AS total_event_value
    FROM o FULL OUTER JOIN e ON o.custkey = e.custkey
    """,
)
def cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: ``groupby().cogroup().applyInArrow`` — Spark's two-sided
    grouped-map. Each key's order rows AND event rows arrive in one
    Python call as two Arrow tables (r10: Arrow-native instead of
    ``applyInPandas`` — same cogrouped-map path, minus the per-key
    pandas conversions; see ``_reconcile``).

    Scale shape: one hash shuffle per side on the key (same cost as
    the equivalent join), then map-side Python over co-located pairs;
    state is one key's data, never the whole relation. Use it when the
    merge logic needs imperative code over both sides at once —
    otherwise prefer the pure join+aggregate plan (which the oracle
    uses to check this one exactly).

    Raw-rows vs pre-aggregate-then-cogroup, measured (r10, noop sink,
    warm min; keys×rows scaling shifts keys so both multiply):

    ========================  =======  ========  =================
    fixture                   raw (s)  pre (s)   pre, AQE-coalesce
                                                 disabled (s)
    ========================  =======  ========  =================
    sf0.1 (150 k rows/15 k k)   2.54     13.81        2.84
    keys×rows × 10             19.61     21.30          —
    rows-only × 10              3.38     11.95          —
    rows-only × 30              3.24     14.45          —
    ========================  =======  ========  =================

    Raw-row wins or ties EVERYWHERE reachable locally: for these
    16-byte rows the Arrow volume is second-order (30× the rows moved
    raw 3.4 → 3.2 s, noise), the wall is per-key Python call overhead
    (~0.1-0.8 ms/key) which pre-agg cannot reduce (same key count),
    and pre-agg's tiny post-agg shuffle gets AQE-coalesced to 1-4
    partitions, SERIALIZING the per-key Python — a 5× regression that
    would also fire in production after any selective filter. The
    pre-agg form only pays off when rows/key × row-width makes the
    Arrow transfer dominate per-key overhead (wide/blob rows — the
    guide §8 regime), which no reachable multiple of this fixture
    exhibits; it is therefore NOT gated in."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    e = load_table(spark, sf_dir, "events").select("user_id", "value")
    return (
        o.groupby("o_custkey")
        .cogroup(e.groupby("user_id"))
        .applyInArrow(_reconcile, _RECONCILE_SCHEMA)
    )


@query(
    "pandas_api_summary",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_quantity), 2) AS total_qty,
           ROUND(AVG(l_extendedprice), 2) AS avg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def pandas_api_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas API on Spark (`pyspark.pandas`): the pandas-shaped
    front end over the same distributed engine — `pandas_api()` wraps
    the Spark DataFrame, the groupby/agg is written as pandas, and
    `to_spark()` returns to the DataFrame world. Fifth oracle-checked
    front-end form (DataFrame / classic SQL / piped SQL /
    parameterized SQL / pandas API): the point is that a pandas-
    literate user gets THE SAME Catalyst plan — the groupby compiles
    to a hash aggregate, not a driver-side pandas operation, so the
    100 TB story is unchanged.

    (Kept to aggregate shapes: pandas-API ops that imply a global
    row order — iloc, cumsum without keys — force a sort or
    single-partition window and are the documented anti-pattern on
    big tables.)"""
    li = load_table(spark, sf_dir, "lineitem")
    psdf = li.select("l_returnflag", "l_quantity", "l_extendedprice").pandas_api()
    out = (
        psdf.groupby("l_returnflag")
        .agg({"l_quantity": "sum", "l_extendedprice": "mean"})
        .reset_index()
    )
    sdf = out.to_spark()
    return (
        sdf.select(
            "l_returnflag",
            F.round(F.col("l_quantity"), 2).alias("total_qty"),
            F.round(F.col("l_extendedprice"), 2).alias("avg_price"),
        )
        .orderBy("l_returnflag")
    )
