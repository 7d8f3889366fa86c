"""Measure the two-level prefix (operators/prefix.py) vs the naive
single-partition global window it replaces, at 3 fixture SFs.

Produces the numbers pinned in prefix.py's module docstring (r06
verdict item 6: the "slower at toy SF, mandatory at scale" claim must
carry its own measurements). The workload is the
`select_corpus_token_budget` shape: a global running token sum over
(n_chars desc, doc_id asc) on the documents table.

Usage: python scripts/measure_prefix.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from impala_refresher_spark.operators.prefix import with_global_running

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("measure_prefix")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()  # JVM warmup

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        docs = spark.read.parquet(path).select(
            "doc_id",
            F.col("n_chars").alias("q"),
            F.size(F.split("text", " ")).alias("tok"),
        )
        n = docs.count()

        def naive():
            w = Window.orderBy(F.col("q").desc(), F.col("doc_id").asc()).rowsBetween(
                Window.unboundedPreceding, 0
            )
            return docs.withColumn("run_tok", F.sum("tok").over(w))

        def two_level():
            return with_global_running(
                docs, "q", False, ["doc_id"], {"run_tok": F.col("tok").cast("long")}
            )

        for label, build in (("naive", naive), ("two-level", two_level)):
            times = []
            for _ in range(reps):
                t0 = time.monotonic()
                build().agg(F.sum("run_tok")).collect()  # force full evaluation
                times.append(time.monotonic() - t0)
            print(f"{sf} rows={n} {label}: best={min(times):.2f}s all={[round(t,2) for t in times]}")

        # value identity (tie-broken total order => exact)
        a = naive().select("doc_id", "run_tok")
        b = two_level().select("doc_id", "run_tok")
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        print(f"{sf} value-diff rows: {diff}")
        assert diff == 0

    # Synthetic scale sweep: the fixtures top out at 5k docs, far below
    # the crossover; generate wider inputs to locate it. Key is a
    # deterministic hash (no ties except by construction), value is
    # small — isolating the window shapes themselves.
    for n in (100_000, 1_000_000, 10_000_000):
        rows = (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                (F.xxhash64("id") % 100_000).alias("q"),
                (F.xxhash64("id", F.lit(1)) % 512 + 512).alias("tok"),
            )
            .repartition(32)
        )

        def naive_n():
            w = Window.orderBy(
                F.col("q").desc(), F.col("doc_id").asc()
            ).rowsBetween(Window.unboundedPreceding, 0)
            return rows.withColumn("run_tok", F.sum("tok").over(w))

        def two_level_n():
            return with_global_running(
                rows, "q", False, ["doc_id"], {"run_tok": F.col("tok").cast("long")}
            )

        for label, build in (("naive", naive_n), ("two-level", two_level_n)):
            times = []
            for _ in range(reps):
                t0 = time.monotonic()
                build().agg(F.sum("run_tok")).collect()
                times.append(time.monotonic() - t0)
            print(
                f"synthetic n={n} {label}: best={min(times):.2f}s "
                f"all={[round(t, 2) for t in times]}"
            )


if __name__ == "__main__":
    main()
