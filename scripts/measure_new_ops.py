"""Scale measurement for the r07 operators on synthetic inputs far
above fixture size (fixtures: 5k docs / 500 vectors), pinning the
"would this survive 100x" numbers in the docstrings.

- span_removal_coverage: N docs x 40 tokens, every adjacent id pair
  identical (floor(id/2) seeds the tokens), so HALF the corpus is
  cross-doc duplicated span mass - a worst-ish case for the
  gaps-and-islands union (every position covered for every doc).
- random_project: N vectors x 64 dims generated in-plan.
- dedup_quality_scoreboard (r08): N docs x ~40 tokens written to a
  scratch documents.parquet (the registered query reads a fixture
  dir); every 5th doc is a near-copy of its predecessor with 2 token
  edits (Jaccard ~0.85, above the 0.4 truth threshold), so truth /
  candidate mass grows linearly with N while hot-shingle posting
  lists stay bounded by the vocab design.

Usage: python scripts/measure_new_ops.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from impala_refresher_spark.operators.dedup import span_removal_coverage
    from impala_refresher_spark.operators.similarity import random_project

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "12g")
        .appName("measure_new_ops")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    for n_docs in (20_000, 200_000):
        toks = F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda j: F.concat(
                F.lit("t"),
                (F.xxhash64(F.floor(F.col("id") / 2), j) % 50).cast("string"),
            ),
        )
        docs = (
            spark.range(n_docs)
            .repartition(32)
            .select(F.col("id").alias("doc_id"), F.concat_ws(" ", toks).alias("text"))
        )
        times = []
        for _ in range(reps):
            t0 = time.monotonic()
            out = span_removal_coverage(docs).agg(
                F.sum("n_dup_tokens").alias("s"), F.count("*").alias("n")
            ).first()
            times.append(time.monotonic() - t0)
        print(
            f"span_removal n_docs={n_docs}: best={min(times):.2f}s "
            f"all={[round(t,2) for t in times]} dup_tokens={out.s} rows={out.n}"
        )

    for n_vecs in (100_000, 1_000_000):
        emb = F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: ((F.xxhash64(F.col("id"), i) % 1000) / 500.0 - 1.0).cast(
                "float"
            ),
        )
        vecs = (
            spark.range(n_vecs)
            .repartition(32)
            .select(F.col("id").alias("vec_id"), emb.alias("embedding"))
        )
        times = []
        for _ in range(reps):
            t0 = time.monotonic()
            out = random_project(vecs).agg(
                F.sum("proj_val").alias("s"), F.count("*").alias("n")
            ).first()
            times.append(time.monotonic() - t0)
        print(
            f"random_project n_vecs={n_vecs}: best={min(times):.2f}s "
            f"all={[round(t,2) for t in times]} rows={out.n}"
        )

    import shutil

    for n_docs in (20_000, 100_000):
        # ~40-token docs over a per-doc-family vocab; every 5th doc
        # near-duplicates its predecessor (same seed, 2 edited tokens).
        seed = F.when(
            F.col("id") % 5 == 4, F.col("id") - 1
        ).otherwise(F.col("id"))
        toks = F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda j: F.when(
                (F.col("id") % 5 == 4) & j.isin(3, 17),
                F.concat(F.lit("e"), F.col("id").cast("string")),
            ).otherwise(
                F.concat(
                    F.lit("t"),
                    (F.xxhash64(seed, j) % 200_000).cast("string"),
                )
            ),
        )
        d = spark.range(n_docs).repartition(32).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", toks).alias("text"),
        )
        sf_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "_scratch",
            f"scoreboard_scale_{n_docs}",
        )
        shutil.rmtree(sf_dir, ignore_errors=True)
        os.makedirs(sf_dir)
        d.write.parquet(os.path.join(sf_dir, "documents.parquet"))

        from impala_refresher_spark.operators.dedup import (
            dedup_quality_scoreboard,
        )

        times = []
        for _ in range(reps):
            t0 = time.monotonic()
            rows = dedup_quality_scoreboard(spark, sf_dir).collect()
            times.append(time.monotonic() - t0)
        summary = {
            r.detector: (r.n_detected, r.n_truth, r.n_hits) for r in rows
        }
        print(
            f"dedup_quality_scoreboard n_docs={n_docs}: best={min(times):.2f}s "
            f"all={[round(t,2) for t in times]} {summary}"
        )
        shutil.rmtree(sf_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
