"""Multimodal column handling (`[EXT]`, SURVEY.md §2.C).

Model: media payloads are opaque ``binary`` columns + a typed metadata
struct — exactly the reference's record model (``Record.Data []byte``,
kinesis.go:34) lifted to a table column. The container has no image/audio
codecs, so the *decode* step is a clearly-marked stub (deterministic fake),
while everything Spark-owned — schema, binary plumbing, Arrow batching,
partitioning, UDF signatures — is real and tested.

The fixture has no binary table, so media blobs are derived
deterministically from ``documents.text`` (unhex(md5·md5)) — both engines
can reproduce them, which keeps even the binary plumbing oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from . import query


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → synthetic media table:
    (doc_id, blob binary, media struct<kind,width,height,n_frames>)."""
    doc = load_table(spark, sf_dir, "documents")
    blob = F.unhex(F.concat(F.md5("text"), F.md5(F.reverse(F.col("text")))))
    return doc.select(
        "doc_id",
        blob.alias("blob"),
        F.struct(
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("kind"),
            (F.col("doc_id") % 64 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 48 + 16).cast("int").alias("height"),
            (F.col("doc_id") % 30 + 1).cast("int").alias("n_frames"),
        ).alias("media"),
    )


# --- Pandas-UDF decode / feature-extract path (the real multimodal shape) --


def _decode_batch(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batches in, per-blob features out.

    A real deployment decodes here (PIL / torchaudio / pyav). Those codecs
    are not in this container, so decode is STUBBED with a deterministic
    fake: "luma" = mean byte value, "frames sampled" = n_frames capped at
    4, "resize" = integer aspect-fit of (width, height) into a 16×16
    thumbnail box. The batch shape, schema, and Arrow transfer are the
    production path.
    """
    for pdf in batch_iter:
        blobs = pdf["blob"]
        longest = pdf[["width", "height"]].max(axis=1)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "blob_bytes": [len(b) for b in blobs],
                "first_byte": [int(b[0]) if len(b) else -1 for b in blobs],
                "n_pixels": pdf["n_pixels"],
                "fake_luma": [
                    float(sum(b)) / len(b) if len(b) else 0.0 for b in blobs
                ],
                "sampled_frames": pdf["n_frames"].clip(upper=4).astype("int32"),
                # aspect-preserving fit into 16×16, integer arithmetic
                # (floor), min 1px — a real resize calls the codec here
                "thumb_w": (pdf["width"] * 16 // longest).clip(lower=1).astype("int32"),
                "thumb_h": (pdf["height"] * 16 // longest).clip(lower=1).astype("int32"),
            }
        )


def decode_media(df: DataFrame) -> DataFrame:
    """Decode/feature-extract over binary media via mapInPandas (Arrow
    batches — the only sanctioned Python hot path). Metadata rides along so
    the worker sees (blob, typed metadata) exactly as a production decoder
    would."""
    flat = df.select(
        "doc_id",
        "blob",
        F.col("media.kind").alias("kind"),
        F.col("media.n_frames").alias("n_frames"),
        F.col("media.width").alias("width"),
        F.col("media.height").alias("height"),
        (F.col("media.width") * F.col("media.height"))
        .cast("long")
        .alias("n_pixels"),
    )
    return flat.mapInPandas(
        _decode_batch,
        schema=(
            "doc_id long, kind string, blob_bytes long, first_byte long, "
            "n_pixels long, fake_luma double, sampled_frames int, "
            "thumb_w int, thumb_h int"
        ),
    )


@query(
    "multimodal_decode_features",
    oracle="""
    WITH blobs AS (
      SELECT doc_id,
             md5(text) || md5(reverse(text)) AS blob_hex,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             CAST(doc_id % 30 + 1 AS INT) AS n_frames,
             doc_id % 64 + 16 AS w,
             doc_id % 48 + 16 AS h,
             CAST(doc_id % 64 + 16 AS BIGINT) * CAST(doc_id % 48 + 16 AS BIGINT) AS n_pixels
      FROM documents
    )
    SELECT doc_id, kind,
           octet_length(unhex(blob_hex)) AS blob_bytes,
           CAST('0x' || substring(blob_hex, 1, 2) AS BIGINT) AS first_byte,
           n_pixels,
           CAST(list_reduce(list_prepend(0::BIGINT,
                  list_transform(range(1, 33),
                                 i -> CAST('0x' || substring(blob_hex, 2*i - 1, 2) AS BIGINT))),
                (a, b) -> a + b) AS DOUBLE) / 32 AS fake_luma,
           CAST(LEAST(n_frames, 4) AS INT) AS sampled_frames,
           CAST(GREATEST(w * 16 // GREATEST(w, h), 1) AS INT) AS thumb_w,
           CAST(GREATEST(h * 16 // GREATEST(w, h), 1) AS INT) AS thumb_h
    FROM blobs
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal pipeline end-to-end: opaque binary column + typed
    metadata struct (the reference's ``Record.Data []byte`` lifted to a
    table column) → mapInPandas (Arrow) → per-media features: payload size,
    first byte, pixel count from metadata, stubbed decode output. The fake
    'decode' (mean byte value) is integer arithmetic, so even this UDF path
    is oracle-checkable. 100 TB posture: blobs stay opaque bytes in parquet;
    metadata drives pruning; decode is the only Python hop and it is
    Arrow-batched."""
    return decode_media(media_table(spark, sf_dir))
