"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Beyond-reference surface (BASELINE.json north star). The design treats
image/audio/video as **binary columns with a metadata struct** — the Spark
side (schema, partition shape, Arrow batch plumbing) is fully real; the
actual codec work (image decode, resample, frame extraction) is stubbed
behind ``mapInPandas`` Pandas-UDF boundaries because the codec libraries
(Pillow/ffmpeg/torchaudio) are not in this container. The stubs are either

- clearly-marked ``NotImplementedError`` raises (``decode_image``), or
- deterministic fakes (``fake_decode_features``) so the distributed
  plumbing (batch iteration, schema mapping, partition preservation) is
  testable end-to-end.

Scale: payload columns ride in parquet binary; metadata-only pipelines
never touch the bytes (column pruning drops the payload at the scan).
Decode stages are ``mapInPandas`` — Arrow batches in, no shuffle, sized by
``spark.sql.files.maxPartitionBytes``; a real deployment pins
``spark.sql.execution.arrow.maxRecordsPerBatch`` so one batch of decoded
frames fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried next to every payload column
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
    ]
)


def with_payload_meta(df: DataFrame, payload_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Attach the typed metadata struct for a binary payload column —
    computed JVM-side (octet length + sha256), no Python."""
    p = F.col(payload_col)
    return df.withColumn(
        f"{payload_col}_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(p).cast("long").alias("n_bytes"),
            F.lower(F.sha2(p, 256)).alias("sha256"),
        ),
    )


def text_as_payload(col: Column) -> Column:
    """Encode a text column as a binary payload (UTF-8) — the test-data
    stand-in for real media bytes."""
    return F.encode(col, "UTF-8")


#: output schema of the (stubbed) image feature extractor
IMAGE_FEATURES_SCHEMA = "doc_id long, width int, height int, mean_luma double"


def decode_image(df: DataFrame, payload_col: str) -> DataFrame:
    """REAL-CODEC STUB: decode image bytes → (width, height, mean_luma).

    The Spark plumbing (mapInPandas over Arrow batches, explicit output
    schema) is the production shape; the codec itself requires Pillow,
    which is not in this container.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "install Pillow and replace this body with Image.open(BytesIO(b))"
        )

    return df.mapInPandas(_decode, schema=IMAGE_FEATURES_SCHEMA)


def fake_decode_features(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Deterministic fake decoder exercising the REAL distributed plumbing:
    mapInPandas over Arrow record batches, one row per payload, features
    derived only from the bytes (stable under repartitioning)."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": payloads.map(lambda b: 1 + len(b) % 640).astype("int32"),
                    "height": payloads.map(lambda b: 1 + len(b) % 480).astype("int32"),
                    "mean_luma": payloads.map(
                        lambda b: (sum(b[:64]) / max(1, len(b[:64]))) / 255.0
                    ).astype("float64"),
                }
            )

    return df.mapInPandas(_features, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, meta_col: str, every_n_bytes: int = 1 << 16) -> DataFrame:
    """Frame-sampling *plan* for video payloads: emit (offset) rows per
    payload without touching bytes — pure metadata arithmetic, JVM-side.
    A real pipeline feeds these offsets to a codec UDF."""
    n = F.col(f"{meta_col}.n_bytes")
    return df.withColumn(
        "frame_offset",
        F.explode(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes))),
    )
