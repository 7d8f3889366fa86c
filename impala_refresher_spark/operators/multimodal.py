"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs
(SURVEY.md §2C L7 extension; north-star multimodal requirement).

The fixtures carry no real media, so the *codec* layer is stubbed
(deterministic fake decode, clearly marked); everything Spark-side is
real and tested: the binary column type, the metadata struct schema,
the mapInPandas batch iteration, partition sizing, and the
feature-extraction plumbing.

Scale notes: media bytes dominate row width — keep them OUT of
shuffles (process with map-only mapInPandas, aggregate only extracted
features), size ``spark.sql.files.maxPartitionBytes`` so a batch of
rows fits executor memory, and store media in parquet binary columns
(or pointers to object storage) partitioned by modality.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from impala_refresher_spark.registry import query
from impala_refresher_spark.sources.tables import fan_out, load_table


def decode_image(data: bytes) -> "object":
    """Real image decode (PIL/OpenCV) — not available in this
    environment. The Spark-side plumbing around it is real; swap this
    body for ``PIL.Image.open(io.BytesIO(data))`` in deployment."""
    raise NotImplementedError("image codec not available in this environment")


def _fake_decode_meta(data: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: derive (width, height) from
    the byte content so tests are stable without a codec."""
    return (64 + data[0] % 64, 64 + data[-1] % 64) if data else (0, 0)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture adapter: documents.text encoded to bytes stands in for
    media payloads; schema matches a real multimodal table —
    (id, media: binary, meta: struct<modality, n_bytes>)."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    media = F.encode("text", "UTF-8")
    return d.select(
        F.col("doc_id").alias("media_id"),
        media.alias("media"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video")
            .alias("modality"),
            F.octet_length("text").alias("n_bytes"),
        ).alias("meta"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("byte_sum_16", T.LongType()),
    ]
)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch of (media_id, media, meta)
    in, one batch of features out. This is where the real decoder
    would run; the fake keeps the batch shape identical.

    NULL media (a NULL source text encodes to NULL bytes) must yield
    NULL features, exactly like the oracle's NULL-propagating SQL —
    the bare maps crashed on None (sum(None[:16])) and the plain-int
    casts crashed on the resulting NaN for the WHOLE batch (the
    `udf_pandas_token_count` class); nullable extension dtypes carry
    pd.NA through Arrow as proper nulls."""
    for pdf in batches:
        dims = pdf["media"].map(lambda b: _fake_decode_meta(b) if b is not None else None)
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "modality": pdf["meta"].map(lambda m: m["modality"]),
                "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]).astype("Int32"),
                "width": dims.map(
                    lambda d: d[0] if d is not None else None
                ).astype("Int32"),
                "height": dims.map(
                    lambda d: d[1] if d is not None else None
                ).astype("Int32"),
                "byte_sum_16": pdf["media"]
                .map(lambda b: sum(b[:16]) if b is not None else None)
                .astype("Int64"),
            }
        )


@query(
    "multimodal_features",
    """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           CAST(length(text) AS INTEGER) AS n_bytes,
           -- empty media decodes to (0, 0) — the fake decoder's
           -- no-bytes contract; without the guard ascii('') = 0 made
           -- the oracle say (64, 64) while mapInPandas said (0, 0)
           CAST(CASE WHEN length(text) = 0 THEN 0
                     ELSE 64 + ascii(substr(text, 1, 1)) % 64 END AS INTEGER) AS width,
           CAST(CASE WHEN length(text) = 0 THEN 0
                     ELSE 64 + ascii(substr(text, -1, 1)) % 64 END AS INTEGER) AS height,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(string_split(substr(text, 1, 16), ''),
                                 c -> CAST(ascii(c) AS BIGINT))),
                (a, b) -> a + b) AS BIGINT) AS byte_sum_16
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary feature extraction through mapInPandas. The oracle
    recomputes the deterministic fake-decode arithmetic in SQL over
    the source text (ASCII corpus ⇒ bytes == characters), proving the
    Arrow batch plumbing preserves values end-to-end."""
    return media_table(spark, sf_dir).mapInPandas(_extract_features, _FEATURE_SCHEMA)


@query(
    "frame_sample",
    """
    SELECT doc_id AS media_id,
           CAST(unnest(range(0, n_chars, 50)) AS INTEGER) AS frame_idx
    FROM documents
    WHERE doc_id % 3 = 2
    """,
)
def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling plumbing: every 50th frame index per video
    row (frame_count stood in by n_chars). The real pipeline maps each
    (media_id, frame_idx) through the decoder stub — the explode shape
    and partitioning are what carry to 100 TB."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)
    # a zero-frame video must yield NO rows: Spark's INCLUSIVE
    # sequence(0, n_chars-1) errors on n_chars = 0 where the oracle's
    # EXCLUSIVE range(0, n_chars) quietly yields [] — guard with the
    # lazy CASE branch (the quality_lm_trigram slice-guard class)
    frames = F.when(
        F.col("n_chars") > 0, F.sequence(F.lit(0), F.col("n_chars") - 1, F.lit(50))
    ).otherwise(F.array().cast("array<long>"))
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.explode(frames).alias("frame_idx"),
    ).select("media_id", F.col("frame_idx").cast("int").alias("frame_idx"))


# ---------------------------------------------------------------------------
# Resize: binary -> binary transform (decode -> resample -> re-encode)
# ---------------------------------------------------------------------------

_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("out_bytes", T.IntegerType()),
    ]
)

_TARGET_W = 32


def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for resize. The codec is stubbed: the "image"
    is its raw bytes and "resizing to width 32" keeps a deterministic
    byte stride — real deployments replace the two marked lines with
    decode + ``img.resize((w, h))`` + re-encode. Binary in, binary
    out: the batch shape, schema, and output-size accounting are the
    real plumbing that carries to production."""
    for pdf in batches:
        # None-aware like _extract_features: NULL media must yield NULL
        # outputs, not crash the Arrow batch on len(None)
        resized = pdf["media"].map(
            lambda b: bytes(b[:: max(1, len(b) // _TARGET_W)]) if b is not None else None
        )  # STUB: decode+resample
        dims = pdf["media"].map(
            lambda b: _fake_decode_meta(b) if b is not None else None
        )  # STUB: decode metadata
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "out_w": pd.Series([_TARGET_W] * len(pdf), dtype="int32"),
                "out_h": dims.map(
                    lambda d: min(d[1], _TARGET_W) if d is not None else None
                ).astype("Int32"),
                "resized": resized,
                "out_bytes": resized.map(
                    lambda b: len(b) if b is not None else None
                ).astype("Int32"),
            }
        )


@query(
    "multimodal_resize",
    f"""
    SELECT doc_id AS media_id,
           CAST({_TARGET_W} AS INTEGER) AS out_w,
           -- explicit NULL/empty branches: DuckDB's LEAST IGNORES
           -- NULLs (LEAST(NULL, 32) = 32) so NULL media would get a
           -- phantom height, and ascii('') = 0 would give empty media
           -- height 32 where the decoder stub says 0
           CAST(CASE WHEN text IS NULL THEN NULL
                     WHEN length(text) = 0 THEN 0
                     ELSE LEAST(64 + ascii(substr(text, -1, 1)) % 64, {_TARGET_W})
                END AS INTEGER) AS out_h,
           CAST((length(text) + greatest(1, length(text) // {_TARGET_W}) - 1)
                // greatest(1, length(text) // {_TARGET_W}) AS INTEGER) AS out_bytes
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing over the media table: binary in, binary out via
    mapInPandas. The oracle recomputes the deterministic stub's output
    DIMENSIONS and SIZE in SQL (the payload bytes themselves are
    engine-opaque binary, so the checked projection drops them)."""
    return (
        media_table(spark, sf_dir)
        .mapInPandas(_resize_batch, _RESIZE_SCHEMA)
        .select("media_id", "out_w", "out_h", "out_bytes")
    )
