"""End-to-end training-corpus assembly: the composite pipeline the
individual LLM-data operators exist for, declared as one oracle-checked
query. Shape: quality gate → exact dedup (keep-first) → near-dup drop
(embedding cosine) → multimodal join (text ⋈ embedding) → features.

Scale story is the sum of its parts (each documented at its operator):
the quality gate is a pushed-down filter; exact dedup shuffles 32-byte
hashes; the near-dup drop list is label-blocked (LSH/IVF-blocked at
100 TB) and lands as a broadcast-able anti-join side; the embedding
join shuffles on the id unless one side broadcasts. One Catalyst plan,
end to end — no materialization between stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from impala_refresher_spark.operators.similarity import (
    _SQL_UNIT,
    _dot,
    _sql_dot,
    _unit,
    blocked_pair_join,
)
from impala_refresher_spark.registry import query
from impala_refresher_spark.sources.tables import fan_out, load_table


@query(
    "pipeline_training_corpus",
    f"""
    WITH survivors AS (
      SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id FROM documents GROUP BY text
    ),
    quality AS (
      SELECT d.doc_id, d.lang, d.source, d.n_chars,
             CAST(len(string_split(d.text, ' ')) AS INTEGER) AS n_tokens
      FROM documents d JOIN survivors s ON d.doc_id = s.doc_id
      WHERE d.n_chars BETWEEN 100 AND 10000
        AND d.lang IN ('en', 'es', 'de', 'fr', 'zh')
    ),
    u AS (SELECT vec_id, label, {_SQL_UNIT("embedding")} AS uv FROM embeddings),
    near_dups AS (
      SELECT DISTINCT b.vec_id AS drop_id
      FROM u a JOIN u b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE {_sql_dot("a.uv", "b.uv")} >= 0.35
    )
    SELECT q.doc_id, q.lang, q.source, q.n_chars, q.n_tokens, e.label
    FROM quality q
    JOIN embeddings e ON q.doc_id = e.vec_id
    WHERE q.doc_id NOT IN (SELECT drop_id FROM near_dups)
    """,
)
def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-prep pipeline as ONE declarative plan:

    1. quality gate: length bounds + language whitelist (pushed into
       the parquet scan);
    2. exact dedup, keep-first survivor per identical text;
    3. embedding-cosine near-dup drop (anti-join against the blocked
       pair list — cf. dedup_embedding_cosine);
    4. join surviving docs to their embedding metadata;
    5. emit per-example features (token counts, provenance, label).
    """
    d = load_table(spark, sf_dir, "documents")
    survivors = d.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    quality = (
        d.filter(
            F.col("n_chars").between(100, 10000)
            & F.col("lang").isin("en", "es", "de", "fr", "zh")
        )
        .join(survivors, "doc_id", "left_semi")
        .select(
            "doc_id", "lang", "source", "n_chars",
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
    )
    e = load_table(spark, sf_dir, "embeddings")
    u = fan_out(e).select("vec_id", "label", _unit(F.col("embedding")).alias("uv"))
    near_dups = (
        blocked_pair_join(u, "label", "vec_id")
        .filter(_dot(F.col("a.uv"), F.col("b.uv")) >= 0.35)
        .select(F.col("b.vec_id").alias("drop_id"))
        .distinct()
    )
    return (
        quality.join(near_dups, quality.doc_id == near_dups.drop_id, "left_anti")
        .join(e.select("vec_id", "label"), quality.doc_id == F.col("vec_id"))
        .select("doc_id", "lang", "source", "n_chars", "n_tokens", "label")
    )
