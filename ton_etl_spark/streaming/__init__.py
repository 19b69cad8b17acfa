from ton_etl_spark.streaming.metrics import tumbling_tps, latency_percentiles

__all__ = ["tumbling_tps", "latency_percentiles"]
