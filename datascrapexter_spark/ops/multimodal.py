"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over `mapInPandas` so one Python call
handles a whole batch and the binary column never round-trips per row.

The sandbox has no image/audio codecs, so the *codec* step is stubbed:
`decode_image` raises NotImplementedError unless `fake=True`, in which
case a clearly-marked deterministic fake derives metadata purely from the
byte content (so tests and SQL oracles can verify the plumbing exactly).
The Spark-side contract — schema, batch shape, partitioning — is real.

Scale notes: binary payloads dominate bytes; the mapInPandas pass keeps
`spark.sql.execution.arrow.maxRecordsPerBatch` sized so a batch of blobs
fits executor memory, and downstream stages select only metadata columns
(column pruning drops the blob at the scan).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),
    T.StructField("byte_len", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
])


def attach_media_column(df: DataFrame, payload_col: str,
                        media_type: str = "image") -> DataFrame:
    """Wrap an existing binary column with the typed metadata struct
    (metadata filled by decode; only byte_len is known pre-decode)."""
    return df.withColumn(
        "media",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(F.col(payload_col)).cast("long").alias("byte_len"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
        ),
    )


def _fake_decode_meta(blob: bytes) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE decode (sandbox has no codecs): metadata is a pure
    function of byte length so an independent SQL oracle can verify the
    plumbing. Replace with a real codec (PIL/ffmpeg) in deployment."""
    n = len(blob)
    width = 64 + (n % 577)          # pseudo-dimensions, stable per payload
    height = 64 + ((n * 31) % 433)
    n_frames = 1 + (n % 7)
    return width, height, n_frames


def decode_image(blob: bytes) -> bytes:
    """Real codec entry point — NOT available in this sandbox."""
    raise NotImplementedError(
        "image decode requires a codec library (PIL/libvips); "
        "use decode_media_df(..., fake=True) for plumbing tests"
    )


def decode_media_df(df: DataFrame, payload_col: str = "payload",
                    fake: bool = False) -> DataFrame:
    """Fill the media metadata struct by decoding each payload.

    One mapInPandas pass; output schema = input columns (minus payload)
    + flattened metadata. With fake=False this calls the real codec
    (NotImplementedError in the sandbox)."""
    out_fields = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = T.StructType(
        out_fields
        + [
            T.StructField("byte_len", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
        ]
    )
    keep = [f.name for f in out_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[payload_col]
            metas = []
            for b in blobs:
                raw = bytes(b) if b is not None else b""
                if not fake:
                    decode_image(raw)  # raises: no codecs in sandbox
                metas.append((len(raw), *_fake_decode_meta(raw)))
            out = pdf[keep].copy()
            out["byte_len"] = [m[0] for m in metas]
            out["width"] = [m[1] for m in metas]
            out["height"] = [m[2] for m in metas]
            out["n_frames"] = [m[3] for m in metas]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def sample_frames_df(df: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling plumbing: explode per-media frame indices 0..n_frames-1
    keeping every nth — pure expressions (the decoded frame bytes would ride
    along in deployment)."""
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1)
    kept = F.filter(idx, lambda i: i % every_nth == 0)
    return df.withColumn("frame_idx", F.explode(kept))
