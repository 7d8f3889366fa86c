"""Scalar function library coverage (SURVEY.md §2C F1-F6): string,
date/time, math, array, JSON, conditional.

All of these are built-in ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen'd, zero Python in the hot path. The declared
queries exercise each family against a DuckDB oracle; dialect
divergences are resolved on the ORACLE side (Spark semantics are the
product surface):

- DuckDB ``log`` is log10; Spark ``F.log`` is natural → oracle uses ``ln``.
- DuckDB ``year/month/day/ntile/len`` return BIGINT; Spark returns INT
  → oracle casts.
- DuckDB has no ``pmod`` → oracle uses ``((x % m) + m) % m``.
- Per-row ROUND is avoided at .xx5-prone boundaries (see relational.py);
  round is applied only where the operand has non-terminating decimals.

r06 dialect audit — classes that DIVERGE only outside the fixtures'
ASCII text, documented rather than oracle-patched (the divergences
are locale/engine-deep, and Spark's behavior is the product
contract; pinned in tests/test_edge_cases.py):

- Exotic case mapping (`fn_strings`): Spark upper('ß') = 'SS' (Java
  full case mapping) vs DuckDB 'ẞ'; Spark lower('İ') keeps the
  combining dot ('i̇') vs DuckDB 'i'. Plain Latin/accents agree
  ('café' ↔ 'CAFÉ').
- JSON strictness/coercion (`fn_json`, `fn_variant_shred`): RESOLVED
  on the oracle side — see those queries' docstrings.
- Levenshtein bytes-vs-codepoints: see operators/linkage.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impala_refresher_spark.registry import query
from impala_refresher_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# F1 — strings
# ---------------------------------------------------------------------------

@query(
    "fn_strings",
    """
    SELECT doc_id,
           upper(substr(text, 1, 10)) AS head,
           lower(lang) AS lang_lc,
           CAST(length(text) AS INTEGER) AS text_len,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           regexp_replace(text, 'a', '@', 'g') AS at_text,
           concat(lang, ':', source) AS tag,
           trim(concat(' ', source, ' ')) AS trimmed
    FROM documents
    """,
)
def fn_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head"),
        F.lower("lang").alias("lang_lc"),
        F.length("text").alias("text_len"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("text", "a", "@").alias("at_text"),
        F.concat_ws(":", "lang", "source").alias("tag"),
        F.trim(F.concat(F.lit(" "), F.col("source"), F.lit(" "))).alias("trimmed"),
    )


# ---------------------------------------------------------------------------
# F2 — date/time
# ---------------------------------------------------------------------------

@query(
    "fn_dates",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(month(o_orderdate) AS INTEGER) AS o_month,
           CAST(day(o_orderdate) AS INTEGER) AS o_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', CAST(TIMESTAMP '1995-01-01' AS DATE),
                          CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_epoch_start,
           CAST(o_orderdate AS DATE) + 7 AS week_later,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS unix_sec
    FROM orders
    """,
)
def fn_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.date_add(F.to_date("o_orderdate"), 7).alias("week_later"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
    )


# ---------------------------------------------------------------------------
# F3 — math
# ---------------------------------------------------------------------------

@query(
    "fn_math",
    """
    SELECT p_partkey,
           abs(p_retailprice - 1000) AS abs_diff,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           pow(p_size, 2) AS size_sq,
           round(CASE WHEN p_retailprice + 1 > 0
                      THEN ln(p_retailprice + 1) END, 4) AS log_price,
           CAST(((p_partkey % 7) + 7) % 7 AS BIGINT) AS bucket
    FROM part
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000).alias("abs_diff"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.pow("p_size", F.lit(2)).alias("size_sq"),
        # log-domain guard: a non-positive argument (credit-priced part)
        # is NULL in Spark but an ERROR in DuckDB — gate on both sides
        F.round(
            F.when(
                F.col("p_retailprice") + 1 > 0, F.log(F.col("p_retailprice") + 1)
            ),
            4,
        ).alias("log_price"),
        F.pmod("p_partkey", F.lit(7)).alias("bucket"),
    )


# ---------------------------------------------------------------------------
# F4 — arrays (on embeddings + tokenized text)
# ---------------------------------------------------------------------------

@query(
    "fn_arrays",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           array_to_string(list_sort(string_split(text, ' ')[1:5]), ',') AS first5_sorted,
           string_split(text, ' ')[2] AS second_token
    FROM documents
    """,
)
def fn_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: size / contains / slice / sort_array / element_at. Array
    results are serialized with array_join so the oracle compare is a
    plain string equality."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.sort_array(F.slice(toks, 1, 5)), ",").alias("first5_sorted"),
        F.element_at(toks, 2).alias("second_token"),
    )


@query(
    "fn_array_vector",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           embedding[1] AS first_component,
           list_sum(embedding) AS comp_sum
    FROM embeddings
    """,
)
def fn_array_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 on the vector column: element access + F.aggregate fold.
    The fold runs in codegen — this is the building block of the
    cosine-similarity operators (operators/similarity.py)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_component"),
        F.aggregate(
            "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
        ).alias("comp_sum"),
    )


# ---------------------------------------------------------------------------
# F5 — JSON (events.props)
# ---------------------------------------------------------------------------

@query(
    "fn_json",
    """
    SELECT event_id,
           CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS k_str,
           TRY_CAST(CASE WHEN json_valid(props) AND json_type(props, '$.k') IN ('UBIGINT', 'BIGINT')
                         THEN json_extract(props, '$.k') END AS INTEGER) AS k_int,
           CASE WHEN json_valid(props) THEN json_extract_string(props, '$.missing') END AS absent
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: get_json_object (path extraction) + from_json (typed parse).
    At scale prefer from_json once into a struct over repeated
    get_json_object calls — one parse instead of N.

    Oracle dialect notes (r06 degenerate-input hardening; fixture
    props are always valid `{"k": <int>}` so these paths never fired):
    Spark's get_json_object NULLs on malformed/NULL/empty JSON where
    DuckDB's json functions RAISE — the oracle guards with
    json_valid(); and Spark's from_json is TYPE-STRICT (k INT yields
    NULL for "12", 2.7, true) where DuckDB's JSON→INTEGER cast
    coerces (12, 3, 1) — the oracle gates on json_type() IN
    (U)BIGINT. Pinned by the adversarial differential in
    tests/test_edge_cases.py."""
    e = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("absent"),
    )


# ---------------------------------------------------------------------------
# F6 — conditionals
# ---------------------------------------------------------------------------

@query(
    "fn_conditional",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS balance_band,
           coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'OTHER') AS segment_or_other,
           greatest(c_acctbal, 1000.0) AS at_least_1k,
           least(c_acctbal, 9000.0) AS at_most_9k
    FROM customer
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("balance_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("AUTOMOBILE")), F.lit("OTHER")).alias(
            "segment_or_other"
        ),
        F.greatest("c_acctbal", F.lit(1000.0)).alias("at_least_1k"),
        F.least("c_acctbal", F.lit(9000.0)).alias("at_most_9k"),
    )


# ---------------------------------------------------------------------------
# F7 — ANSI-safe (try_*) arithmetic and casts
# ---------------------------------------------------------------------------

@query(
    "fn_try_safe",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber - 1 = 0 THEN NULL
                ELSE CAST(l_quantity AS BIGINT) // (l_linenumber - 1) END
             AS qty_per_prior_line,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
           TRY_CAST(CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS INTEGER) AS qty_as_int
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: error-safe expressions — `try_divide` (NULL on /0 instead of
    an ANSI exception or a silent wrong answer) and `try_cast` (NULL on
    malformed input; note Spark is stricter than DuckDB — '44.0' does
    NOT try_cast to INT in Spark, so the success path feeds an
    integer-formatted string). These are the functions a 100 TB pipeline uses at
    the dirty edge of ingest: one bad row must become a NULL to filter,
    never a task retry storm. `l_linenumber - 1` makes real zero
    divisors; `l_returnflag` ('N'/'R'/'A') makes real failed casts.
    The oracle mirrors try_divide with an explicit CASE (DuckDB raises
    on integer /0) and uses its native TRY_CAST for the rest."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_quantity").cast("bigint"), F.col("l_linenumber") - 1
        ).cast("bigint").alias("qty_per_prior_line"),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.col("l_quantity").cast("bigint").cast("string").try_cast("int")
        .alias("qty_as_int"),
    )


# ---------------------------------------------------------------------------
# F8 — VARIANT semi-structured ingestion (Spark 4 open variant type)
# ---------------------------------------------------------------------------

@query(
    "fn_variant_shred",
    """
    WITH shred AS (
      SELECT event_type,
             CASE WHEN json_valid(props) THEN
               CASE json_type(props, '$.k')
                 WHEN 'UBIGINT' THEN TRY_CAST(json_extract(props, '$.k') AS INTEGER)
                 WHEN 'BIGINT'  THEN TRY_CAST(json_extract(props, '$.k') AS INTEGER)
                 WHEN 'DOUBLE'  THEN TRY_CAST(TRUNC(TRY_CAST(json_extract(props, '$.k') AS DOUBLE)) AS INTEGER)
                 WHEN 'BOOLEAN' THEN CASE json_extract_string(props, '$.k') WHEN 'true' THEN 1 ELSE 0 END
                 WHEN 'VARCHAR' THEN CASE
                   WHEN regexp_full_match(json_extract_string(props, '$.k'), '\\s*[-+]?[0-9]+\\s*')
                   THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) END
               END
             END AS k_int,
             CASE WHEN json_valid(props) THEN json_extract_string(props, '$.missing') END AS missing
      FROM events
    )
    SELECT event_type,
           CAST(SUM(k_int) AS BIGINT) AS sum_k,
           CAST(MAX(k_int) AS INTEGER) AS max_k,
           CAST(SUM(CASE WHEN missing IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM shred GROUP BY event_type
    """,
)
def fn_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: semi-structured ingestion through Spark 4's open VARIANT
    type — `try_parse_json` once into a binary variant, then typed
    `try_variant_get` path extraction (no per-query re-parse, no
    schema declared up front), shredded straight into an aggregate.
    Missing paths and malformed documents come back NULL (counted
    here), which is the schema-on-read contract — the non-try forms
    would CRASH the whole job on one malformed producer record
    (r06 hardening; fixture props always parse, so the crash path
    was unreachable in the differential).

    At 100 TB VARIANT beats string-JSON because the parse cost is paid
    once at ingest and the binary encoding supports typed,
    pushdown-friendly field access; it beats rigid structs because
    producers can add fields without a migration. Oracle replicates
    the VARIANT int-coercion table per JSON type (integral → value,
    double → TRUNC toward zero — DuckDB's plain cast ROUNDS, a silent
    divergence at 2.7 → Spark 2 vs DuckDB 3 — bool → 0/1, integral
    string → parsed, everything else NULL), pinned adversarially in
    tests/test_edge_cases.py."""
    e = load_table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    missing = F.try_variant_get(v, "$.missing", "string")
    return e.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"),
        F.max(k).alias("max_k"),
        F.sum(F.when(missing.isNull(), 1).otherwise(0)).cast("bigint").alias("n_missing"),
        F.count("*").alias("n"),
    )
