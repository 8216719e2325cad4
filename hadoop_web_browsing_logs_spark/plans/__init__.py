from .registry import Query, all_queries, get_query, oracle_sql, queries, query

__all__ = ["Query", "all_queries", "get_query", "oracle_sql", "queries", "query"]
