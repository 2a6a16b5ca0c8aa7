"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Beyond-reference surface (BASELINE.json north star). The design treats
image/audio/video as **binary columns with a metadata struct** — the Spark
side (schema, partition shape, Arrow batch plumbing) is fully real, and so
is one codec: ``decode_image`` parses binary PPM (P6) — header, comments,
raster — and computes Rec.601 pixel statistics with numpy, end-to-end
executable with zero external dependencies (``encode_ppm`` is its
generator twin). Formats that need real codec libraries
(JPEG/PNG/ffmpeg/torchaudio — not in this container) raise a clear error
at the same seam; ``fake_decode_features`` remains as the deterministic
fake for plumbing tests that want arbitrary payload bytes.

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


#: output schema of the image feature extractor
IMAGE_FEATURES_SCHEMA = "doc_id long, width int, height int, max_val int, mean_luma double"


def encode_ppm(
    df: DataFrame,
    id_col: str,
    r_col: str,
    g_col: str,
    b_col: str,
    w_col: str,
    h_col: str,
) -> DataFrame:
    """Render a binary PPM (P6) payload per row: header ``P6\\n{w} {h}\\n255\\n``
    followed by ``w*h`` repetitions of the (r, g, b) byte triple. The
    deterministic image generator for decode round-trips — same
    ``mapInPandas`` Arrow boundary as a real renderer. Output:
    ``(id_col, payload binary)``."""
    id_dtype = dict(df.dtypes)[id_col]

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                b"P6\n%d %d\n255\n" % (w, h) + bytes((r, g, b)) * (w * h)
                for r, g, b, w, h in zip(
                    pdf[r_col], pdf[g_col], pdf[b_col], pdf[w_col], pdf[h_col]
                )
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return df.mapInPandas(_render, schema=f"{id_col} {id_dtype}, payload binary")


def _parse_ppm(b: bytes) -> tuple[int, int, int, "object"]:
    """Parse binary PPM (P6): magic, then width/height/maxval tokens with
    arbitrary whitespace and ``#`` comments, one whitespace byte, raster.
    Returns (width, height, maxval, HxWx3 uint8 array)."""
    import numpy as np

    if not b.startswith(b"P6"):
        raise ValueError(
            "decode_image: unsupported image codec — only binary PPM (P6) "
            "decodes dependency-free; for JPEG/PNG install Pillow and "
            "extend _parse_ppm"
        )
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment runs to end of line
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(b[start:pos]))
    pos += 1  # exactly one whitespace byte separates maxval from the raster
    w, h, maxval = vals
    need = w * h * 3
    if len(b) - pos < need:
        raise ValueError(f"decode_image: truncated raster ({len(b) - pos} < {need})")
    raster = np.frombuffer(b, dtype=np.uint8, count=need, offset=pos).reshape(h, w, 3)
    return w, h, maxval, raster


def decode_image(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """REAL decode: PPM (P6) bytes → (width, height, max_val, mean_luma).

    ``mean_luma`` is the Rec.601 luma ``0.299 R + 0.587 G + 0.114 B``
    averaged over all pixels, normalized by ``maxval`` — computed in
    float64 over the numpy raster, one vectorized pass per image.

    The Spark plumbing (mapInPandas over Arrow batches, explicit output
    schema, no shuffle) is the production shape for ANY codec; PPM is the
    one format that needs zero dependencies, so this path is executable
    end-to-end in this container. Non-PPM payloads raise with a clear
    pointer at the Pillow extension seam rather than guessing.
    """
    import numpy as np

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, mvs, lumas = [], [], [], []
            for b in pdf[payload_col]:
                w, h, maxval, raster = _parse_ppm(bytes(b))
                lum = (
                    0.299 * raster[:, :, 0].astype(np.float64)
                    + 0.587 * raster[:, :, 1].astype(np.float64)
                    + 0.114 * raster[:, :, 2].astype(np.float64)
                )
                ws.append(w)
                hs.append(h)
                mvs.append(maxval)
                lumas.append(float(lum.mean()) / maxval)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "max_val": pd.Series(mvs, dtype="int32"),
                    "mean_luma": pd.Series(lumas, dtype="float64"),
                }
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
                    "max_val": pd.Series([255] * len(pdf), dtype="int32"),
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
