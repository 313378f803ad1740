from hours_api_clickup_spark.plans.registry import QUERIES, QuerySpec, load_table

__all__ = ["QUERIES", "QuerySpec", "load_table"]
