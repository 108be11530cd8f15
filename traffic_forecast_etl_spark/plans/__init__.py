from .catalog import QUERIES, ORACLE, flagship_query

__all__ = ["QUERIES", "ORACLE", "flagship_query"]
