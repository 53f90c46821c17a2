from stream_cdc_spark.plans.queries import QUERIES, QuerySpec

__all__ = ["QUERIES", "QuerySpec"]
