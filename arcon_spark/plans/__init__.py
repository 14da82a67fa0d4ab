from arcon_spark.plans.registry import REGISTRY, QuerySpec, register, queries, oracle_sql

__all__ = ["REGISTRY", "QuerySpec", "register", "queries", "oracle_sql"]
