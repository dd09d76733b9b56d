from titan_spark.plans.catalog import ORACLE_SQL, QUERIES, entry_query

__all__ = ["QUERIES", "ORACLE_SQL", "entry_query"]
