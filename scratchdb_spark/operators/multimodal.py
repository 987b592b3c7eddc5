"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode libraries (PIL/ffmpeg/librosa) are not in this container, so
the decode kernels are STUBS — clearly marked — but the Spark-side
plumbing is real and tested: binary payload columns, metadata structs,
Arrow-batched ``mapInPandas`` with explicit output schemas, and a
deterministic fake feature extractor standing in for a real model so
the distributed shape (schema, batching, partitioning) is exercised
end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata carried alongside every payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def attach_payload(
    df: DataFrame,
    source_col: str = "text",
    media_type: str = "application/octet-stream",
) -> DataFrame:
    """Synthesize an opaque binary payload column (here: the utf-8
    bytes of a text column — a deterministic stand-in for image/audio
    bytes) plus a typed metadata struct."""
    payload = F.encode(F.col(source_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.octet_length(F.col("payload")).alias("n_bytes"),
            F.lit(media_type).alias("media_type"),
            F.md5(F.col("payload")).alias("checksum"),
        ),
    )


FEATURE_DIM = 16

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """'Feature-extract' each payload via Arrow-batched mapInPandas.

    STUB KERNEL: a real deployment would decode the image/audio here
    (PIL.Image.open / librosa.load) and run a model; this container has
    neither, so the kernel computes a deterministic 16-bucket byte
    histogram (normalized) per payload. The Spark plumbing — binary
    column in, fixed-dim double vector out, vectorized over Arrow
    batches — is exactly what the real kernel would use.
    """
    cols = df.select(F.col(id_col).alias("doc_id"), "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                hist = [0] * FEATURE_DIM
                if payload is not None:
                    for b in payload:
                        hist[b % FEATURE_DIM] += 1
                    total = max(1, len(payload))
                    hist = [round(h / total, 6) for h in hist]
                feats.append(hist)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return cols.mapInPandas(kernel, schema=_FEATURES_SCHEMA)


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4,
                  id_col: str = "doc_id") -> DataFrame:
    """Split each payload into ``n_frames`` evenly spaced byte slices —
    the row-fan-out shape of video frame sampling (one input row ->
    n output rows), with the decode itself stubbed."""
    cols = df.select(F.col(id_col).alias("doc_id"), "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_frame = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                step = max(1, len(payload) // n_frames)
                for i in range(min(n_frames, len(payload))):
                    out_id.append(doc_id)
                    out_idx.append(i)
                    out_frame.append(bytes(payload[i * step:(i + 1) * step]))
            yield pd.DataFrame(
                {"doc_id": out_id, "frame_idx": out_idx, "frame": out_frame}
            )

    return cols.mapInPandas(kernel, schema=_FRAMES_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_media(
    df: DataFrame, target_bytes: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """'Resize' each payload to a fixed byte length by nearest-neighbor
    resampling of the byte stream (index ``floor(i * n / target)``).

    STUB KERNEL: a real deployment would decode and PIL-resize the
    image here; nearest-neighbor index arithmetic over the raw bytes is
    the same gather pattern a real resampler uses, is deterministic
    (SQL-oracle-checkable byte-for-byte), and exercises the real Spark
    plumbing: binary in, numpy gather per Arrow batch, binary out.
    Empty payloads produce no row (a decode failure would be dropped
    the same way).
    """
    import numpy as np

    cols = df.select(F.col(id_col).alias("doc_id"), "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx_base = np.arange(target_bytes, dtype=np.int64)
        for pdf in batches:
            out_id, out_bytes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                a = np.frombuffer(payload, dtype=np.uint8)
                out_id.append(doc_id)
                out_bytes.append(a[(idx_base * len(a)) // target_bytes].tobytes())
            yield pd.DataFrame({"doc_id": out_id, "resized": out_bytes})

    return cols.mapInPandas(kernel, schema=_RESIZE_SCHEMA)


def decode_image(df: DataFrame) -> DataFrame:
    """Real image decode — NOT AVAILABLE in this container (no PIL/
    opencv). Kept as the documented integration point."""
    raise NotImplementedError(
        "image decode requires PIL/opencv which are not installed; "
        "use extract_features() for the stubbed pipeline shape"
    )
