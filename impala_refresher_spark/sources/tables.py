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

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS). Spark builds
    differ in how they surface that type, so normalize ALL observed
    behaviors to a plain microsecond ``timestamp`` (matching how DuckDB
    coerces nanos to its micro-precision TIMESTAMP, so oracle
    comparisons agree on both values and schema):

    - read errors (PARQUET_TYPE_ILLEGAL on builds that refuse nanos):
      set ``spark.sql.legacy.parquet.nanosAsLong`` (a runtime SQL conf)
      and retry — self-sufficient under a vanilla driver session;
    - ``bigint`` (nanosAsLong in effect): ``timestamp_micros(ns/1000)``;
    - ``timestamp_ntz`` (builds that read nanos natively as NTZ): cast
      to ``timestamp`` — both this session and the driver's run with a
      UTC session timezone, so the wall-clock reinterpretation is the
      identity and values equal DuckDB's naive micros.
    """
    path = f"{sf_dir}/{name}.parquet"
    try:
        df = spark.read.parquet(path)
    except Exception:
        if name != "events":
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


_SIZE_UNITS = {"": 1, "b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _size_bytes(v: str) -> int:
    """Parse a Spark byte-size conf string ("134217728", "128m", "128MB")."""
    s = str(v).strip().lower()
    if s.endswith("b") and not s[:-1].isdigit():
        s = s[:-1]
    unit = ""
    if s and s[-1] in _SIZE_UNITS:
        unit, s = s[-1], s[:-1]
    return int(float(s)) * _SIZE_UNITS[unit]


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition a scan to full core count IF it arrived
    in fewer splits — for CPU-heavy map stages (shingling, hashing,
    vector math) whose input is byte-light but compute-dense.

    At 100 TB inputs arrive in thousands of splits and this is a no-op
    (the guard keeps the shuffle out of the plan). It pays off exactly
    when split count < cores: small fixtures, or a cluster reading a
    few unsplittable files — the standard repartition-after-skinny-scan
    pattern. The shuffle it may add moves only the scanned bytes.

    The split-count guard is PLAN-SIDE: it mirrors Spark's file
    bin-packing formula over ``df.inputFiles()`` sizes instead of
    probing ``df.rdd`` (which forces an analysis pass and pins the
    pre-AQE partitioning). Non-scan or non-local inputs (no listable
    files) skip the repartition — exactly the no-op we want at scale.
    """
    spark = df.sparkSession
    want = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files:
        return df
    import os
    from urllib.parse import urlparse

    total = 0
    for uri in files:
        p = urlparse(uri)
        if p.scheme not in ("", "file"):
            return df  # remote store: arrives in real splits already
        try:
            total += os.path.getsize(p.path or uri)
        except OSError:
            return df
    max_split = _size_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    open_cost = _size_bytes(spark.conf.get("spark.sql.files.openCostInBytes", "4m"))
    # Spark packs splits toward targetSize = min(maxPartitionBytes,
    # max(openCost, totalPadded / defaultParallelism)).
    padded = total + len(files) * open_cost
    target = min(max_split, max(open_cost, padded // max(want, 1)))
    est_splits = max(1, -(-padded // max(target, 1)))
    if est_splits < want:
        return df.repartition(want)
    return df


def scratch_tag(sf_dir: str, *names: str) -> str:
    """Cache key for scratch materializations derived from fixture
    tables: sf-dir basename + each source's mtime/size. An in-place
    fixture update changes the tag, so a stale materialization is
    simply never reused (the oracle always reads the raw files —
    without this, cached scratch data silently diverges from it)."""
    import os

    parts = [os.path.basename(sf_dir.rstrip("/")).replace(".", "_")]
    for n in names:
        try:
            st = os.stat(f"{sf_dir}/{n}.parquet")
            parts.append(f"{st.st_mtime_ns:x}{st.st_size:x}")
        except OSError:
            parts.append("na")
    return "_".join(parts)


def scratch_path(base: str, prefix: str, sf_dir: str, *names: str) -> str:
    """Freshness-keyed scratch dir ``{base}/{prefix}_{sf}_{content-hex}``.

    Deletes stale siblings of the SAME (prefix, sf) group — earlier
    fixture versions' dead copies — while other scale factors' caches
    (different sf component) are untouched, so multi-SF runs (warm at
    sf0.001, timed at sf0.1) never churn each other's materializations."""
    import os
    import shutil

    sf = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    hexes = []
    for n in names:
        try:
            st = os.stat(f"{sf_dir}/{n}.parquet")
            hexes.append(f"{st.st_mtime_ns:x}{st.st_size:x}")
        except OSError:
            hexes.append("na")
    group = f"{prefix}_{sf}"
    want = f"{group}_{'_'.join(hexes)}"
    try:
        for entry in os.listdir(base):
            if entry.startswith(f"{group}_") and entry != want:
                shutil.rmtree(os.path.join(base, entry), ignore_errors=True)
    except OSError:
        pass
    return os.path.join(base, want)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] | None = None
) -> None:
    """Register fixture tables as temp views for spark.sql use.

    ``tables`` narrows registration to just the tables a query needs,
    so one unreadable fixture can't fail an unrelated SQL query.
    """
    for name in tables if tables is not None else TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
