"""Multimodal column plumbing: image/audio/video as opaque binary.

Convention: a modality column is a ``binary`` payload plus a typed
metadata struct (``MEDIA_META_SCHEMA``).  All heavy per-item work
(decode, resize, frame-sample, feature-extract) runs as Arrow-batched
``mapInPandas`` — batches of bytes cross the JVM→Python boundary once
per Arrow batch, never per row.

The decode step itself is STUBBED in this environment (no PIL/ffmpeg
in the container): ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless the optional libraries import, and the
test path uses ``fake_decode_meta`` — a deterministic pure-bytes
"decoder" (length + header peek + md5) so the Spark-side plumbing
(schemas, batch shapes, partitioning) is real and fully tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False


def attach_fake_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic binary fixture: utf-8 bytes of the text column —
    stands in for an image/audio payload so the binary pipeline can be
    exercised end-to-end on the documents table."""
    return df.withColumn("blob", F.encode(F.col(text_col), "utf-8")).withColumn(
        "meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col("text")).cast("long").alias("n_bytes"),
        ),
    )


FAKE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("head_hex", T.StringType(), True),
        T.StructField("content_md5", T.StringType(), True),
    ]
)


def fake_decode_meta(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    Deterministic fake decoder: byte length, first-4-bytes hex (the
    "magic number" a real decoder would sniff), md5 of the payload.
    Real decode drops in here by replacing the per-batch body — the
    Spark plumbing (mapInPandas over binary, explicit output schema,
    batch-at-a-time) is exactly what a PIL/ffmpeg decoder needs.
    """
    import hashlib

    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            blobs = pdf[blob_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": blobs.map(len).astype("int64"),
                    "head_hex": blobs.map(lambda b: bytes(b[:4]).hex()),
                    "content_md5": blobs.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(batches, FAKE_META_SCHEMA)


def decode_image(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """Decode image binaries to (width, height, mode).  STUB: requires
    PIL, which is not in this container."""
    if not _HAS_PIL:  # pragma: no cover
        raise NotImplementedError(
            "image decode requires PIL; use fake_decode_meta for the "
            "plumbing path in this environment"
        )
    import io

    import pandas as pd
    from PIL import Image

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("mode", T.StringType(), True),
        ]
    )

    def batches(it):  # pragma: no cover - needs PIL
        for pdf in it:
            out = {"doc_id": [], "width": [], "height": [], "mode": []}
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                img = Image.open(io.BytesIO(bytes(b)))
                out["doc_id"].append(i)
                out["width"].append(img.width)
                out["height"].append(img.height)
                out["mode"].append(img.mode)
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(batches, schema)


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Video frame sampling STUB: deterministic fake — emits one row
    per simulated frame (duration proxied by payload length) so the
    1→N row-explosion shape (mapInPandas yielding more rows than it
    consumed) is real and tested."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("frame_idx", T.IntegerType(), True),
            T.StructField("frame_ts_ms", T.LongType(), True),
        ]
    )
    bytes_per_ms = 10  # fake: 10 bytes of payload ≈ 1ms of media

    def batches(it):
        for pdf in it:
            ids, idxs, tss = [], [], []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                dur = max(len(b) // bytes_per_ms, 1)
                for j, ts in enumerate(range(0, dur, every_ms)):
                    ids.append(i)
                    idxs.append(j)
                    tss.append(ts)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_ts_ms": tss}
            )

    return df.select(id_col, blob_col).mapInPandas(batches, schema)
