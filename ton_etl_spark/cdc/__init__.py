from ton_etl_spark.cdc.schema import (
    CDC_EVENT_SCHEMA,
    CDC_EVENT_SCHEMA_EVOLVED,
    OP_COL,
    LSN_COL,
    TS_COL,
    op_priority_expr,
)
from ton_etl_spark.cdc.generator import generate_cdc_log, write_cdc_log
from ton_etl_spark.cdc.apply import (
    final_state_oracle,
    apply_cdc_batch,
    replay_log_batched,
)

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
