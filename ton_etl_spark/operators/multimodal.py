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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def _resize_stub(payload: bytes | None, width: int, height: int) -> bytes | None:
    """STUB resize kernel (a real deployment plugs Pillow here): deterministic
    nearest-neighbor-style byte resample to the target 'pixel budget'."""
    if payload is None:
        return None
    b = bytes(payload)
    target = max(1, (width * height) // 64)
    if not b:
        return b
    return bytes(b[(i * len(b)) // target] for i in range(target))


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas resize: image rows get a re-encoded payload + new
    dimensions, non-image rows pass through untouched.  Output schema ==
    input schema, so resize composes with any downstream media op."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["kind"] == "image"
            payload = [
                _resize_stub(p, width, height) if img else p
                for p, img in zip(pdf["payload"], is_img)
            ]
            out = pdf.copy()
            out["payload"] = payload
            out.loc[is_img, "width"] = width
            out.loc[is_img, "height"] = height
            yield out

    return media.mapInPandas(_resize, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """1-to-N frame sampling (mapInPandas UDTF shape): each VIDEO row yields
    ``duration_ms // every_ms`` frame rows; images/audio yield none.  The
    frame payload is a deterministic stub slice of the encoded bytes (a real
    deployment plugs ffmpeg); the fan-out plumbing — variable rows-out per
    row-in over Arrow batches — is real."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            # pd.to_numeric: a NULL duration arrives as float NaN in the
            # pandas batch (nullable int), and int(NaN) raises
            dur = pd.to_numeric(pdf["duration_ms"], errors="coerce")
            valid = (pdf["kind"] == "video") & pdf["payload"].notna() & (dur > 0)
            sub = pdf[valid.fillna(False)]
            if len(sub) == 0:
                continue
            n = (dur[valid.fillna(False)].astype("int64") // every_ms).to_numpy()
            sub, n = sub[n > 0], n[n > 0]
            if len(sub) == 0:
                continue
            # vectorized fan-out (same shape as explode_token_windows):
            # per-frame source row, frame index, and byte offsets come from
            # numpy repeat/cumsum — the only per-item Python left is the
            # byte slice itself, which is the stand-in for real codec work
            total = int(n.sum())
            row_of = np.repeat(np.arange(len(sub)), n)
            starts = np.concatenate(([0], np.cumsum(n)[:-1]))
            idx = np.arange(total, dtype=np.int64) - starts[row_of]
            payloads = [bytes(p) for p in sub["payload"]]
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(sub))
            lo = (idx * lens[row_of]) // n[row_of]
            hi = ((idx + 1) * lens[row_of]) // n[row_of]
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(sub["media_id"].to_numpy()[row_of], dtype="object"),
                    "frame_idx": pd.Series(idx, dtype="int32"),
                    "ts_ms": pd.Series(idx * every_ms, dtype="int32"),
                    "frame": pd.Series(
                        [payloads[r][int(a):int(b)] for r, a, b in zip(row_of, lo, hi)],
                        dtype="object",
                    ),
                }
            )

    return media.mapInPandas(_frames, schema=FRAME_SCHEMA)


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
