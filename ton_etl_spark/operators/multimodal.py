"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The reference stores opaque BOC binary cells alongside typed columns
(``body_boc``/``data_boc``, ``datalake/athena_ddl.sql:182-185``) and decodes
them in Python workers; the same shape here carries media bytes.

The IMAGE path is first-class: a pure-numpy PPM (P6) codec — an
uncompressed public format needing no codec libraries — so decode,
per-channel statistics, and nearest-neighbor resize run on real pixels
and are oracle-expressible.  Exotic codecs (JPEG, audio, video frames)
still need libraries absent from this container: every kernel is
INJECTABLE (``decode_kernel=``), the default returns ``None`` for
payloads it cannot decode, and the documented fallbacks keep the Spark
plumbing — schema, batching, Arrow transfer, fan-out — fully exercised.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
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

PPM_MIME = "image/x-portable-pixmap"


# ---------------------------------------------------------------------------
# pure-numpy PPM (P6) codec — real pixels, no codec dependencies
# ---------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array → binary PPM (P6) bytes."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"encode_ppm expects (h, w, 3), got {a.shape}")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → (h, w, 3) uint8 array.  Handles the format's
    whitespace/comment grammar (magic, then width/height/maxval tokens with
    ``#`` comments), raises on anything malformed — a corrupt payload must
    surface, not produce garbage pixels."""
    b = bytes(payload)
    if b[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(b):
            raise ValueError("truncated PPM header")
        ch = b[pos : pos + 1]
        if ch == b"#":  # comment to end of line
            nl = b.find(b"\n", pos)
            pos = len(b) if nl < 0 else nl + 1
        elif ch.isspace():
            pos += 1
        else:
            end = pos
            while end < len(b) and not b[end : end + 1].isspace():
                end += 1
            tokens.append(b[pos:end])
            pos = end
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported (maxval {maxval})")
    need = w * h * 3
    raster = b[pos : pos + need]
    if len(raster) != need:
        raise ValueError(f"PPM raster truncated: {len(raster)} < {need}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def default_decode_kernel(payload: bytes | None, kind: str, mime: str | None) -> np.ndarray | None:
    """Default injectable decode kernel: PPM images decode to real pixels;
    anything else returns ``None`` (a deployment with Pillow/ffmpeg plugs
    its own kernel here — the signature is the seam)."""
    if payload is None or kind != "image":
        return None
    b = bytes(payload)
    if b[:2] != b"P6":
        return None
    return decode_ppm(b)


def _byte_histogram(payload: bytes) -> list[float]:
    """Opaque-payload fallback feature: normalized 8-bin byte histogram
    (the only honest feature for a codec we cannot decode)."""
    counts = np.bincount(
        np.frombuffer(bytes(payload[:4096]), dtype=np.uint8) & 7, minlength=8
    ).astype(np.float64)
    total = counts.sum() or 1.0
    return list(counts / total)


def _pixel_feature(px: np.ndarray) -> list[float]:
    """Decoded pixels → [width, height, channels, mean_r, mean_g, mean_b,
    std] (population std over all pixels/channels — deterministic float64
    math over exact uint8 sums)."""
    h, w, c = px.shape
    f = px.astype(np.float64)
    return (
        [float(w), float(h), float(c)]
        + [float(f[:, :, i].mean()) for i in range(c)]
        + [float(f.std())]
    )


def extract_features(
    media: DataFrame,
    decode_kernel: Callable[[bytes | None, str, str | None], np.ndarray | None] = default_decode_kernel,
    fallback_histogram: bool = True,
) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches of (binary, meta) in,
    feature vectors out.  Binary columns never hit Python row-at-a-time —
    each batch arrives as one Arrow buffer.

    Rows the kernel decodes get REAL pixel features (dims + per-channel
    mean + std, length 7); undecodable rows get the 8-bin byte histogram
    when ``fallback_histogram`` (else NULL) so opaque formats keep flowing
    through the same plumbing."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def feat(p, k, m):
            if p is None:
                return None
            px = decode_kernel(p, k, m)
            if px is not None:
                return _pixel_feature(px)
            return _byte_histogram(p) if fallback_histogram else None

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "feature": [
                        feat(p, k, m)
                        for p, k, m in zip(pdf["payload"], pdf["kind"], pdf["mime"])
                    ],
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("px_std", T.DoubleType(), True),
    ]
)


def image_stats(
    media: DataFrame,
    decode_kernel: Callable[[bytes | None, str, str | None], np.ndarray | None] = default_decode_kernel,
    ndigits: int = 4,
) -> DataFrame:
    """Typed per-image statistics from DECODED pixels — the oracle-gated
    form of the image path (dims, per-channel mean, population std over
    all pixels).  Rows the kernel cannot decode yield NULL stats rather
    than vanishing: a silent drop would hide codec gaps."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p, k, m in zip(
                pdf["media_id"], pdf["payload"], pdf["kind"], pdf["mime"]
            ):
                px = decode_kernel(p, k, m) if p is not None else None
                if px is None:
                    rows.append((mid, None, None, None, None, None, None, None))
                    continue
                h, w, c = px.shape
                f = px.astype(np.float64)
                means = [round(float(f[:, :, i].mean()), ndigits) for i in range(3)]
                rows.append(
                    (mid, w, h, c, *means, round(float(f.std()), ndigits))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_STATS_SCHEMA.fields])

    return media.mapInPandas(_stats, schema=IMAGE_STATS_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (h, w, 3) → (height, width, 3): index
    mapping only, bit-exact deterministic across platforms."""
    h, w, _ = px.shape
    ys = (np.arange(height, dtype=np.int64) * h) // height
    xs = (np.arange(width, dtype=np.int64) * w) // width
    return px[ys][:, xs]


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    decode_kernel: Callable[[bytes | None, str, str | None], np.ndarray | None] = default_decode_kernel,
) -> DataFrame:
    """mapInPandas resize: image rows the kernel decodes are resampled
    (real nearest-neighbor on pixels) and re-encoded as PPM with updated
    dimensions; undecodable images and non-image rows pass through
    untouched (the injectable-kernel seam — plug a Pillow kernel to cover
    JPEG et al.).  Output schema == input schema, so resize composes with
    any downstream media op."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, mimes, ws, hs = [], [], [], []
            for p, k, m, w0, h0 in zip(
                pdf["payload"], pdf["kind"], pdf["mime"], pdf["width"], pdf["height"]
            ):
                px = decode_kernel(p, k, m) if p is not None else None
                if px is None:
                    payloads.append(p)
                    mimes.append(m)
                    ws.append(w0)
                    hs.append(h0)
                else:
                    payloads.append(encode_ppm(resize_nearest(px, width, height)))
                    mimes.append(PPM_MIME)
                    ws.append(width)
                    hs.append(height)
            out = pdf.copy()
            out["payload"] = pd.Series(payloads, index=pdf.index, dtype="object")
            out["mime"] = pd.Series(mimes, index=pdf.index, dtype="object")
            out["width"] = pd.array(ws, dtype="Int32")
            out["height"] = pd.array(hs, dtype="Int32")
            yield out

    return media.mapInPandas(_resize, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """1-to-N frame sampling (mapInPandas UDTF shape): each VIDEO row yields
    ``duration_ms // every_ms`` frame rows; images/audio yield none.  The
    frame payload is a deterministic stub slice of the encoded bytes (video
    codecs are genuinely absent — a real deployment plugs ffmpeg); the
    fan-out plumbing — variable rows-out per row-in over Arrow batches —
    is real."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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


# ---------------------------------------------------------------------------
# deterministic synthetic media — real PPM payloads for the image path
# ---------------------------------------------------------------------------

# id → image geometry/content, shared with the DuckDB oracle (closed-form):
#   width  = 8 + (id % 5) * 4          (8..24)
#   height = 8 + (id % 3) * 4          (8..16)
#   pixel[y, x, c] = x + y + 10*c      (max 23+15+20 = 58 < 256: no wrap,
#                                       so mean/std have exact closed forms)
_CHANNEL_STEP = 10


def synth_image_array(media_id: int) -> np.ndarray:
    w = 8 + (media_id % 5) * 4
    h = 8 + (media_id % 3) * 4
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    return (x + y + _CHANNEL_STEP * c).astype(np.uint8)


def synth_images(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic image media table from an id column: every row becomes
    one REAL PPM payload whose pixel content is a closed-form function of
    the id (see ``synth_image_array``) — generated distributed over Arrow
    batches, statistics SQL-derivable for the oracle."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                arr = synth_image_array(i)
                h, w, _ = arr.shape
                rows.append(
                    (f"m{i}", "image", encode_ppm(arr), PPM_MIME, w, h, None)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return ids.select(id_col).mapInPandas(_gen, schema=MEDIA_SCHEMA)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic mixed-kind media table: image rows carry REAL PPM
    payloads (decodable by the default kernel); audio/video rows carry
    opaque hash-derived bytes standing in for codecs this container lacks.
    Kind assignment is a JVM-side hash of (id, seed)."""
    df = spark.range(n)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    # opaque payload for audio/video: concat of hashed strings → utf-8 bytes
    opaque = F.encode(
        F.concat(*[F.conv(F.xxhash64("id", F.lit(seed + i)).cast("string"), 10, 16) for i in range(8)]),
        "utf-8",
    )
    base = df.select(
        F.col("id"),
        kind.alias("kind"),
        opaque.alias("opaque"),
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, k, op in zip(pdf["id"], pdf["kind"], pdf["opaque"]):
                i = int(i)
                if k == "image":
                    arr = synth_image_array(i)
                    h, w, _ = arr.shape
                    rows.append((f"m{i}", k, encode_ppm(arr), PPM_MIME, w, h, None))
                else:
                    rows.append(
                        (f"m{i}", k, bytes(op), "application/octet-stream", 64, 64, 1000)
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return base.mapInPandas(_gen, schema=MEDIA_SCHEMA)
