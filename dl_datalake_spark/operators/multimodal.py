"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
mapInPandas stages. The actual codec step is STUBBED (media libraries
are not in this container): `decoder=None` uses a deterministic fake so
the Spark-side plumbing — schema, batch shape, partitioning — is real
and tested; pass a real decoder callable in production.

Scale: mapInPandas streams Arrow batches (no per-row Python), binary
payloads never hit the driver, and feature extraction is a narrow
map — no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType(
            [
                T.StructField("mime", T.StringType()),
                T.StructField("width", T.IntegerType()),
                T.StructField("height", T.IntegerType()),
                T.StructField("duration_ms", T.LongType()),
            ]
        )),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("feat_dim", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real image/audio decoder: derives a
    feature vector from the payload digest. Replace with a real codec
    (PIL/torchaudio/ffmpeg) via the `decoder` argument."""
    d = hashlib.sha256(payload or b"").digest()
    return [d[i] / 255.0 for i in range(dim)]


def attach_binary_column(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize a media table from a text table (test plumbing):
    payload = utf-8 bytes, metadata struct populated."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] | None = None,
    feat_dim: int = 8,
) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""
    decode = decoder
    dim = feat_dim

    # NOTE: this closure executes on Python workers, which may not have
    # this package importable (driver-owned sessions started outside the
    # repo). Keep it self-contained: stdlib/pandas imports inside, no
    # module-global references — cloudpickle then ships it by value.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as pd

        def fake_decode(payload: bytes) -> list[float]:
            d = hashlib.sha256(payload or b"").digest()
            return [d[i] / 255.0 for i in range(dim)]

        decode_fn = decode or fake_decode
        for pdf in batches:
            payloads = pdf["payload"]
            feats = [decode_fn(bytes(p) if p is not None else b"") for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": payloads.map(lambda p: len(p) if p is not None else 0),
                    "digest": payloads.map(
                        lambda p: hashlib.sha256(bytes(p) if p is not None else b"").hexdigest()
                    ),
                    "feat_dim": dim,
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_SCHEMA["meta"].dataType),
    ]
)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Arrow-batched image resize over the binary column.

    `resizer(payload, w, h) -> payload` is the real codec hook
    (PIL/opencv — not in this container). Without one, the payload
    passes through unchanged and only the metadata is rewritten, which
    keeps the plumbing (schema, batch shape, narrow no-shuffle map)
    real and testable; a production caller injects the actual codec.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # worker-side closure: self-contained imports (see extract_features)
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            if resizer is not None:
                payloads = payloads.map(
                    lambda p: resizer(bytes(p) if p is not None else b"", width, height)
                )
            meta = pdf["meta"].map(
                lambda m: {**(m or {}), "width": width, "height": height}
            )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads, "meta": meta}
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id,
    frame_ts) rows from duration metadata; the actual frame decode is
    the stubbed decoder's job. Pure relational — sequence + explode."""
    return media.where(F.col("meta.duration_ms").isNotNull()).select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ts"),
    )
