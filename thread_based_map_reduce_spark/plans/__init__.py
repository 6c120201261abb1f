from .catalog import CATALOG, Query, register, queries, oracle_sql

__all__ = ["CATALOG", "Query", "register", "queries", "oracle_sql"]
