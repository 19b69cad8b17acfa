from ton_etl_spark.streaming.metrics import tumbling_tps, latency_percentiles
from ton_etl_spark.streaming.observability import (
    MetricsRecorder,
    attach_metrics_recorder,
    batch_duration_percentiles,
    detach_metrics_recorder,
    ingest_rate_windows,
    make_metrics_table,
)
from ton_etl_spark.streaming.exporter import (
    GaugeRegistry,
    index_percentiles,
    rolling_delay_gauges,
    rolling_tps_gauge,
    start_metrics_server,
    update_delivery_gauges,
    update_performance_gauges,
)

__all__ = [
    "tumbling_tps",
    "latency_percentiles",
    "MetricsRecorder",
    "attach_metrics_recorder",
    "detach_metrics_recorder",
    "make_metrics_table",
    "ingest_rate_windows",
    "batch_duration_percentiles",
    "GaugeRegistry",
    "index_percentiles",
    "rolling_delay_gauges",
    "rolling_tps_gauge",
    "start_metrics_server",
    "update_delivery_gauges",
    "update_performance_gauges",
]
