from ton_etl_spark.cdc.schema import (
    CDC_EVENT_SCHEMA,
    CDC_EVENT_SCHEMA_EVOLVED,
    OP_COL,
    LSN_COL,
    TS_COL,
    op_priority_expr,
)
from ton_etl_spark.cdc.generator import generate_cdc_log, write_cdc_log

__all__ = [
    "CDC_EVENT_SCHEMA",
    "CDC_EVENT_SCHEMA_EVOLVED",
    "OP_COL",
    "LSN_COL",
    "TS_COL",
    "op_priority_expr",
    "generate_cdc_log",
    "write_cdc_log",
    "final_state_oracle",
    "apply_cdc_batch",
    "replay_log_batched",
]


def __getattr__(name):
    # lazy: cdc.apply imports lake.merge which imports cdc.schema — eager
    # import here would close the cycle
    if name in ("final_state_oracle", "apply_cdc_batch", "replay_log_batched", "read_state"):
        from ton_etl_spark.cdc import apply as _apply

        return getattr(_apply, name)
    raise AttributeError(name)
