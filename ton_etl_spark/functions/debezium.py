"""Debezium numeric wire-format decode, vectorized.

Debezium serializes Postgres NUMERIC as ``{"value": base64(two's-complement
big-endian bytes), "scale": int}``; the reference decodes it per-row in
``datalake/converters/converter.py:41-47`` / ``parser/parsers/utils.py:8-9``
and golden-tests it in ``tests/datalake/test_converter.py:31-65``.  Here the
decode is an Arrow-batched pandas UDF emitting a decimal string (callers
cast to DecimalType(38,0)/(38,scale) as needed — values up to 2^256 exceed
Spark's max decimal precision, so the lossless carrier is a string).
"""

from __future__ import annotations

import base64

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _decode_one(value_b64: str | None, scale) -> str | None:
    if value_b64 is None:
        return None
    # a nullable-int scale arrives from pandas as float NaN, not None —
    # int(nan or 0) raises; a missing scale means "unscaled integer"
    if scale is None or scale != scale:
        scale = 0
    raw = base64.b64decode(value_b64)
    unscaled = int.from_bytes(raw, byteorder="big", signed=True) if raw else 0
    s = int(scale)
    if s == 0:
        return str(unscaled)
    if s < 0:
        # Postgres NUMERIC allows negative scale: value = unscaled * 10^-s
        return str(unscaled) + "0" * (-s) if unscaled != 0 else "0"
    sign = "-" if unscaled < 0 else ""
    digits = str(abs(unscaled)).rjust(s + 1, "0")
    return f"{sign}{digits[:-s]}.{digits[-s:]}"


@F.pandas_udf(T.StringType())
def decode_debezium_decimal_udf(value_b64: pd.Series, scale: pd.Series) -> pd.Series:
    # Arrow batches in; arbitrary-precision ints need Python objects, but the
    # loop runs once per batch over plain lists (no Spark serde per row).
    scales = scale.astype("object")
    return pd.Series(
        [_decode_one(v, s) for v, s in zip(value_b64.tolist(), scales.tolist())],
        dtype="object",
    )
