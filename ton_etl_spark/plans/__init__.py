from ton_etl_spark.plans.queries import QUERIES, ORACLES, load_table

__all__ = ["QUERIES", "ORACLES", "load_table"]
