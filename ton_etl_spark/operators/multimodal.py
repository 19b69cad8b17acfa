"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The reference stores opaque BOC binary cells alongside typed columns
(``body_boc``/``data_boc``, ``datalake/athena_ddl.sql:182-185``) and decodes
them in Python workers; the same shape here carries media bytes.  The
decode kernels (image decode, resample, frame extraction) need codec
libraries that are NOT in this container — they are stubbed behind
``_decode_stub`` with a deterministic fake, while everything Spark-side
(schema, batching, partition sizing, UDF signatures) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_stub(payload: bytes | None, kind: str) -> list[float]:
    """STUB decode kernel. A real deployment plugs Pillow/torchaudio/ffmpeg
    here; the container has none of them, so this produces a deterministic
    fake feature from the raw bytes (length-8 byte-histogram sketch).
    Raise instead with real codecs absent + strict mode."""
    if payload is None:
        return []
    out = [0.0] * 8
    for i, b in enumerate(payload[:4096]):
        out[b & 7] += 1.0
    total = sum(out) or 1.0
    return [v / total for v in out]


def extract_features(media: DataFrame, batch_rows_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches of (binary, meta) in,
    fixed-width feature vectors out.  Binary columns never hit Python
    row-at-a-time — each batch arrives as one Arrow buffer."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "feature": [
                        _decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests (payload bytes from
    a hash expression — generated distributed, JVM-side)."""
    df = spark.range(n)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    # payload: concat of hashed strings → cast to binary
    payload = F.encode(
        F.concat(*[F.conv(F.xxhash64("id", F.lit(seed + i)).cast("string"), 10, 16) for i in range(8)]),
        "utf-8",
    )
    return df.select(
        F.concat(F.lit("m"), F.col("id")).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width").cast("int"),
        F.lit(64).alias("height").cast("int"),
        F.lit(1000).alias("duration_ms").cast("int"),
    )
