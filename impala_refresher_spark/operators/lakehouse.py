"""Lakehouse-style table-maintenance operators: MERGE upsert, SCD2
history, and Z-order clustering stats.

The reference (a catalog-refresh CLI, ``impala-refresher.go:46-181``)
keeps external tables fresh FOR consumers; these are the operations the
producers of those tables run — upserting late-arriving facts,
maintaining dimension history, and clustering data layout for scan
pruning. All pure DataFrame compositions (no Delta/Iceberg dependency):
MERGE is a full outer join + coalesce, SCD2 is a lead() window, Z-order
is integer bit-interleave arithmetic — each shape survives 100 TB
unchanged because it shuffles once on the natural key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from impala_refresher_spark.registry import query
from impala_refresher_spark.sources.tables import load_table


@query(
    "merge_upsert_orders",
    """
    WITH updates AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice * 1.10 AS o_totalprice
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, 'N' AS o_orderstatus,
             o_totalprice * 0.5 AS o_totalprice
      FROM orders WHERE o_orderkey % 13 = 0
    ),
    base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders
    )
    SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
           COALESCE(u.o_custkey, b.o_custkey) AS o_custkey,
           COALESCE(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
           COALESCE(u.o_totalprice, b.o_totalprice) AS o_totalprice,
           CASE WHEN b.o_orderkey IS NULL THEN 'insert'
                WHEN u.o_orderkey IS NULL THEN 'keep'
                ELSE 'update' END AS merge_action
    FROM base b FULL OUTER JOIN updates u ON b.o_orderkey = u.o_orderkey
    ORDER BY o_orderkey
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (WHEN MATCHED THEN UPDATE / WHEN NOT
    MATCHED THEN INSERT) as a pure DataFrame composition: full outer
    join on the key, COALESCE(update, base) per column, and an action
    tag. The updates batch is derived deterministically from the
    fixture (repriced every-7th order + new synthetic every-13th
    order at offset keys) so the oracle can rebuild it. Prices stay
    UNROUNDED per-row: both engines compute the identical IEEE
    product, while rounding x.xx5 half-cent boundaries would diverge.

    At scale this is the standard upsert-without-a-table-format plan:
    ONE shuffle of each side on the merge key. With a real lakehouse
    format the same join runs against only the matched file groups
    (merge-on-read); the logical shape is identical.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    repriced = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            (F.col("o_totalprice") * 1.10).alias("o_totalprice"),
        )
    )
    inserted = (
        o.filter(F.col("o_orderkey") % 13 == 0)
        .select(
            (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
            "o_custkey",
            F.lit("N").alias("o_orderstatus"),
            (F.col("o_totalprice") * 0.5).alias("o_totalprice"),
        )
    )
    updates = repriced.unionByName(inserted)
    b, u = base.alias("b"), updates.alias("u")
    return (
        b.join(u, F.col("b.o_orderkey") == F.col("u.o_orderkey"), "full_outer")
        .select(
            F.coalesce(F.col("u.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
            F.coalesce(F.col("u.o_custkey"), F.col("b.o_custkey")).alias("o_custkey"),
            F.coalesce(F.col("u.o_orderstatus"), F.col("b.o_orderstatus")).alias(
                "o_orderstatus"
            ),
            F.coalesce(F.col("u.o_totalprice"), F.col("b.o_totalprice")).alias(
                "o_totalprice"
            ),
            F.when(F.col("b.o_orderkey").isNull(), "insert")
            .when(F.col("u.o_orderkey").isNull(), "keep")
            .otherwise("update")
            .alias("merge_action"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "scd2_user_value_history",
    """
    SELECT user_id,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           ROUND(value, 4) AS value,
           CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                AS BOOLEAN) AS is_current
    FROM events
    WHERE event_type = 'purchase' AND user_id % 50 = 0
    ORDER BY user_id, valid_from, value
    """,
)
def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: each user's purchase stream
    becomes [valid_from, valid_to) intervals with an is_current flag —
    the standard dimension-history build (lead() over the change
    stream). The user_id sample bounds result size; the window
    partitions by user_id, so the one shuffle is by user and interval
    construction is a single pass per partition. At 100 TB the same
    window runs per user shard; no self-join, no driver state.
    """
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 50 == 0)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.round("value", 4).alias("value"),
            F.lead("ts").over(w).isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "value")
    )


def _morton16(x, y):
    """16-bit Morton (Z-order) code interleaving the low 8 bits of x
    (even positions) and y (odd positions) — pure integer arithmetic,
    identical in Spark and DuckDB."""
    code = F.lit(0).cast("bigint")
    for i in range(8):
        xbit = F.shiftright(x.cast("bigint"), i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y.cast("bigint"), i).bitwiseAND(F.lit(1))
        code = (
            code
            + F.shiftleft(xbit, 2 * i)
            + F.shiftleft(ybit, 2 * i + 1)
        )
    return code


def _sql_morton16(x: str, y: str) -> str:
    terms = []
    for i in range(8):
        terms.append(f"((({x}::BIGINT >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y}::BIGINT >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


@query(
    "zorder_cluster_stats",
    f"""
    WITH coded AS (
      SELECT l_partkey % 256 AS px, l_suppkey % 256 AS sx,
             {_sql_morton16("l_partkey % 256", "l_suppkey % 256")} AS morton
      FROM lineitem
    )
    SELECT morton >> 10 AS zbucket,
           CAST(MIN(px) AS BIGINT) AS px_min, CAST(MAX(px) AS BIGINT) AS px_max,
           CAST(MIN(sx) AS BIGINT) AS sx_min, CAST(MAX(sx) AS BIGINT) AS sx_max,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM coded
    GROUP BY morton >> 10
    ORDER BY zbucket
    """,
)
def zorder_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering layout: Morton-interleave two join keys into
    one code, bucket rows by code prefix (= the files a Z-ordered
    write would produce), and report per-bucket min/max of BOTH keys —
    the data-skipping statistics a scan would prune on. The point the
    stats demonstrate: every bucket bounds BOTH dimensions (each
    2^10-code bucket spans ≤ 32 distinct values of either 8-bit key),
    so a predicate on EITHER key prunes most buckets — which a sort by
    (partkey, suppkey) can't do for the second key.

    At 100 TB the same code feeds ``repartitionByRange(morton)`` +
    sorted parquet writes; the stats here are exactly the min/max
    footer stats those files would carry. The bit-interleave is pure
    codegen integer arithmetic — no UDF.
    """
    l = load_table(spark, sf_dir, "lineitem")
    px = F.col("l_partkey") % 256
    sx = F.col("l_suppkey") % 256
    coded = l.select(
        px.alias("px"), sx.alias("sx"), _morton16(px, sx).alias("morton")
    )
    return (
        coded.groupBy(F.shiftright("morton", 10).alias("zbucket"))
        .agg(
            F.min("px").alias("px_min"),
            F.max("px").alias("px_max"),
            F.min("sx").alias("sx_min"),
            F.max("sx").alias("sx_max"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("zbucket")
    )


# ---------------------------------------------------------------------------
# M7 — materialized inverted index: build once, serve term lookups
# ---------------------------------------------------------------------------

@query(
    "inverted_index_serve",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    postings AS (
      SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY token, doc_id
    )
    SELECT p.doc_id, p.tf, d.lang, d.n_chars
    FROM postings p JOIN documents d USING (doc_id)
    WHERE p.token = 'customer'
    """,
)
def inverted_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7: term lookup served from a MATERIALIZED inverted index. The
    (token, doc_id, tf) posting table is built once per fixture
    version (freshness-keyed scratch, like the compaction query) and
    PARTITIONED BY a token hash bucket — so a term lookup reads one
    directory partition, not the corpus. The oracle computes the same
    answer from the raw table, proving index-serving is lossless.

    At 100 TB this is the search-index pattern: corpus-sized build
    cost amortized across every lookup; the serving scan is
    posting-list-sized with partition pruning on the bucket key
    (PartitionFilters on tok_bucket — the directory layout IS the
    index). KWIC/BM25-style queries compose on top of the same
    postings."""
    import os

    from impala_refresher_spark.sources.tables import scratch_path

    _SCRATCH_BASE = "/root/repo/_scratch"
    d = load_table(spark, sf_dir, "documents")
    idx = scratch_path(_SCRATCH_BASE, "inv_index", sf_dir, "documents")
    if not os.path.exists(f"{idx}/_SUCCESS"):
        (
            d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
            .groupBy("token", "doc_id")
            .agg(F.count("*").alias("tf"))
            .withColumn("tok_bucket", F.pmod(F.xxhash64("token"), F.lit(64)))
            .repartition("tok_bucket")
            .write.mode("overwrite")
            .partitionBy("tok_bucket")
            .parquet(idx)
        )
    postings = spark.read.parquet(idx)
    term = "customer"
    # The bucket predicate compares the PARTITION column to a foldable
    # expression (xxhash64 of a literal): Catalyst constant-folds it,
    # so the scan's PartitionFilters prune to ONE directory — the
    # lookup never touches the other 63 buckets.
    served = postings.filter(
        (F.col("tok_bucket") == F.pmod(F.xxhash64(F.lit(term)), F.lit(64)))
        & (F.col("token") == term)
    )
    return served.join(
        d.select("doc_id", "lang", "n_chars"), "doc_id"
    ).select("doc_id", "tf", "lang", "n_chars")


# ---------------------------------------------------------------------------
# M13 — incremental inverted-index maintenance: merge a new batch's
# postings without rebuilding the base index
# ---------------------------------------------------------------------------

@query(
    "inverted_index_delta_merge",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    postings AS (
      SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY token, doc_id
    )
    SELECT p.doc_id, p.tf,
           CASE WHEN p.doc_id % 13 = 4 THEN 'delta' ELSE 'base' END AS src,
           d.lang
    FROM postings p JOIN documents d USING (doc_id)
    WHERE p.token = 'customer'
    """,
)
def inverted_index_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M13: INCREMENTAL maintenance of the M7 inverted index — the
    ingest-side twin of ``dedup_incremental_batch``. A new document
    batch (deterministic split: ``doc_id % 13 = 4``) arrives after the
    base index was built; only the BATCH is tokenized (O(batch), not
    O(corpus)) and its postings land as a second bucketed segment in
    the SAME 64-way ``xxhash64(token)`` layout as the base. The
    logical index is the union of the two segments — zero base-file
    rewrites, no corpus reshuffle on ingest (append-only doc_ids mean
    no posting collides, so merge needs no re-aggregation). A term
    lookup then serves from the merged index: the bucket predicate
    constant-folds and prunes BOTH segments to one directory each.
    The oracle recomputes the same answer from the raw table, proving
    incremental maintenance is lossless vs a full rebuild.

    At 100 TB this is LSM-style search-index ingest: each arriving
    batch appends one bucketed segment (batch-sized work); serving
    cost grows only with segment COUNT, which the companion
    ``compact_small_files`` shape bounds by periodically folding delta
    segments into the base. The reference's refresh loop
    (impala-refresher.go:46-181) re-points consumers at such
    incrementally-maintained external tables; this is the producer
    side of that contract."""
    import os

    from impala_refresher_spark.sources.tables import scratch_path

    _SCRATCH_BASE = "/root/repo/_scratch"
    n_buckets = 64
    d = load_table(spark, sf_dir, "documents")
    is_delta = F.col("doc_id") % 13 == 4

    def _postings(docs: DataFrame) -> DataFrame:
        return (
            docs.select(
                "doc_id", F.explode(F.split("text", " ")).alias("token")
            )
            .groupBy("token", "doc_id")
            .agg(F.count("*").alias("tf"))
            .withColumn(
                "tok_bucket", F.pmod(F.xxhash64("token"), F.lit(n_buckets))
            )
        )

    base_idx = scratch_path(_SCRATCH_BASE, "inv_base", sf_dir, "documents")
    delta_idx = scratch_path(_SCRATCH_BASE, "inv_delta", sf_dir, "documents")
    if not os.path.exists(f"{base_idx}/_SUCCESS"):
        (
            _postings(d.filter(~is_delta))
            .repartition("tok_bucket")
            .write.mode("overwrite")
            .partitionBy("tok_bucket")
            .parquet(base_idx)
        )
    if not os.path.exists(f"{delta_idx}/_SUCCESS"):
        # The maintenance step: reads ONLY the new batch — the base
        # segment is never opened, let alone rewritten.
        (
            _postings(d.filter(is_delta))
            .repartition("tok_bucket")
            .write.mode("overwrite")
            .partitionBy("tok_bucket")
            .parquet(delta_idx)
        )
    # Explicit segment schema: an empty segment (first-ever batch, or
    # a batch whose docs all landed one side of the split) has no data
    # files to infer from — and at index scale, inference would list
    # every file driver-side anyway. The partition column rides along
    # in the declared schema.
    seg_schema = "token STRING, doc_id BIGINT, tf BIGINT, tok_bucket BIGINT"
    merged = (
        spark.read.schema(seg_schema)
        .parquet(base_idx)
        .withColumn("src", F.lit("base"))
        .unionByName(
            spark.read.schema(seg_schema)
            .parquet(delta_idx)
            .withColumn("src", F.lit("delta"))
        )
    )
    term = "customer"
    # Foldable bucket predicate → PartitionFilters prune each segment
    # to one directory; Catalyst pushes it below the union.
    served = merged.filter(
        (
            F.col("tok_bucket")
            == F.pmod(F.xxhash64(F.lit(term)), F.lit(n_buckets))
        )
        & (F.col("token") == term)
    )
    return served.join(d.select("doc_id", "lang"), "doc_id").select(
        "doc_id", "tf", "src", "lang"
    )


@query(
    "snapshot_diff_orders",
    """
    WITH old AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
    ),
    new AS (
        -- deterministic v2: every-97th key deleted, every-7th-at-3
        -- repriced, every-131st-at-5 inserted under an offset key
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 3
                    THEN o_totalprice * 1.10 ELSE o_totalprice END
                   AS o_totalprice,
               o_orderstatus
        FROM orders
        WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_totalprice * 0.25, 'N'
        FROM orders WHERE o_orderkey % 131 = 5
    )
    SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           o.o_totalprice AS old_price,
           n.o_totalprice AS new_price
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice <> n.o_totalprice
       OR o.o_orderstatus <> n.o_orderstatus
    ORDER BY o_orderkey
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot audit diff — the read-side complement of MERGE
    (``merge_upsert_orders`` applies changes; this RECOVERS them):
    full-outer-join two table versions on the key and emit only
    added / removed / changed rows with before/after values — the
    standard CDC-backfill and table-audit primitive.

    The v2 snapshot is derived deterministically from the fixture
    (delete / reprice / insert by key residue) so the oracle rebuilds
    it exactly; prices stay unrounded per-row (identical IEEE
    products both engines — repo float discipline). At scale: ONE
    shuffle of each snapshot on the key; with a lakehouse format the
    same join reads only files whose min/max key ranges overlap, and
    AQE handles the skew. The inequality change-filter runs post-join
    inside codegen."""
    o = load_table(spark, sf_dir, "orders")
    old = o.select("o_orderkey", "o_totalprice", "o_orderstatus")
    new = (
        o.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 7 == 3, F.col("o_totalprice") * 1.10
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            "o_orderstatus",
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 131 == 5).select(
                (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
                (F.col("o_totalprice") * 0.25).alias("o_totalprice"),
                F.lit("N").alias("o_orderstatus"),
            )
        )
    )
    ov, nv = old.alias("o"), new.alias("n")
    return (
        ov.join(nv, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
        .filter(
            F.col("o.o_orderkey").isNull()
            | F.col("n.o_orderkey").isNull()
            | (F.col("o.o_totalprice") != F.col("n.o_totalprice"))
            | (F.col("o.o_orderstatus") != F.col("n.o_orderstatus"))
        )
        .select(
            F.coalesce(F.col("n.o_orderkey"), F.col("o.o_orderkey")).alias(
                "o_orderkey"
            ),
            F.when(F.col("o.o_orderkey").isNull(), "added")
            .when(F.col("n.o_orderkey").isNull(), "removed")
            .otherwise("changed")
            .alias("change_type"),
            F.col("o.o_totalprice").alias("old_price"),
            F.col("n.o_totalprice").alias("new_price"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "partition_checksums",
    """
    SELECT CAST(DATE_TRUNC('day', o_orderdate) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM((o_orderkey * 2654435761
                     + CAST(ROUND(o_totalprice * 100) AS BIGINT) * 40503
                     + o_custkey * 8191 + 97) % 1000003) AS BIGINT)
               AS checksum
    FROM orders
    GROUP BY 1
    ORDER BY day
    """,
)
def partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition content fingerprints: an order-insensitive row
    hash (portable integer arithmetic — same family as
    ``cms_frequency_estimate``) summed per day partition. Two replicas
    /eras of a table agree iff every (day, n_rows, checksum) row
    agrees — the anti-entropy / post-migration / post-compaction
    audit primitive, and the cheap first pass before a row-level
    ``snapshot_diff_orders``.

    Prices enter as exact integer cents; every product stays < 2^63
    (no overflow divergence) and all operands are positive (identical
    ``%`` semantics both engines), so the checksum is bit-identical
    cross-engine — unlike an xxhash64 fingerprint, which would force a
    rows-only check. One partial-aggregable pass: map-side combine
    carries one (count, sum) pair per day per task; checksums for
    sub-partitions merge by addition, so a 100 TB table can be
    fingerprinted shard-by-shard and folded."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    h = (
        F.col("o_orderkey") * 2654435761
        + cents * 40503
        + F.col("o_custkey") * 8191
        + 97
    ) % 1000003
    return (
        o.groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("day"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(h).cast("long").alias("checksum"),
        )
        .orderBy("day")
    )
