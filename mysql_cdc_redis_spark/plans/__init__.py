from .catalog import Query, all_queries, get_query, register

__all__ = ["Query", "all_queries", "get_query", "register"]
