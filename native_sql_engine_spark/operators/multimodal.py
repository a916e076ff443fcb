"""Multimodal columns: opaque binary payloads + typed metadata.

The reference has NO binary/array/map/struct support (SURVEY §1.3 — those
types fall back to row execution); PySpark has them natively.  This module
models image/audio/video as ``binary`` payload columns with a metadata
struct, and implements decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` operators.

The container has no image/audio codecs, so the *decode* kernels are
deterministic fakes or clearly-marked stubs (NotImplementedError); the
Spark-side plumbing — schema, batch iteration, partitioning — is real and
tested.  Swapping in PIL/ffmpeg later changes only the inner function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct type attached to every payload
MEDIA_META = T.StructType(
    [
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("mime", T.StringType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize a binary payload column + metadata struct from a source
    column (stand-in for reading image bytes; schema-identical to a real
    media table: (id, payload binary, meta struct))."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        "*",
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("byte_len"),
            F.sha2(payload, 256).alias("sha256"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def fake_decode_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", dim: int = 8
) -> DataFrame:
    """'Decode' each payload into a fixed-size feature vector.

    Deterministic fake decode: byte-histogram moments — the same batch
    shape (id, array<double>[dim]) a real image feature extractor returns.
    Arrow-batched via mapInPandas: one Python roundtrip per ~10k-row batch,
    exactly the reference's columnar-UDF transport idea
    (ColumnarArrowEvalPythonExec.scala:51,204-243).
    """
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            feats = []
            for raw in pdf[payload_col]:
                arr = np.frombuffer(bytes(raw), dtype=np.uint8)
                if len(arr) == 0:
                    feats.append([0.0] * dim)
                    continue
                hist = np.bincount(arr % dim, minlength=dim).astype("float64")
                feats.append(list(np.round(hist / hist.sum(), 6)))
            yield pd.DataFrame({id_col: pdf[id_col].values, "features": feats})

    return df.select(id_col, payload_col).mapInPandas(batches, schema)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real image decode — STUB: no codec libraries in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv (not in container); "
        "use fake_decode_features for the pipeline shape"
    )


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — STUB (no codec libraries in this container)."""
    raise NotImplementedError("image resize requires PIL/opencv (not in container)")


def sample_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling — STUB (no ffmpeg in this container)."""
    raise NotImplementedError("frame sampling requires ffmpeg (not in container)")
