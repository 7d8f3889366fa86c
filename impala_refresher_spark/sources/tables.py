"""Parquet sources for the fixture star schema.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table
under ``{sf_dir}/``.

Scale notes: ``spark.read.parquet`` is the Catalyst-native scan —
predicate pushdown, column pruning and partition pruning all apply.
At 100 TB the same call reads a partitioned directory tree
(``.../orders/o_orderdate=.../part-*.parquet``); nothing here changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# (region/nation are bounded by geography; supplier/part/customer are
# broadcastable at test SFs but shuffle at 100 TB — joins mark only the
# always-small ones for explicit broadcast and let AQE decide the rest).
ALWAYS_BROADCAST = ("region", "nation")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Plain parquet scan: pushdown-friendly.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark
    reads only as a long (``spark.sql.legacy.parquet.nanosAsLong``);
    convert to a microsecond timestamp here — truncation matches how
    DuckDB coerces nanos to its micro-precision TIMESTAMP, so oracle
    comparisons agree.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition a scan to full core count IF it arrived
    in fewer splits — for CPU-heavy map stages (shingling, hashing,
    vector math) whose input is byte-light but compute-dense.

    At 100 TB inputs arrive in thousands of splits and this is a no-op
    (the guard keeps the shuffle out of the plan). It pays off exactly
    when split count < cores: small fixtures, or a cluster reading a
    few unsplittable files — the standard repartition-after-skinny-scan
    pattern. The shuffle it may add moves only the scanned bytes."""
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
