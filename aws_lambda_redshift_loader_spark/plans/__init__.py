from .registry import QUERIES, QuerySpec, register

__all__ = ["QUERIES", "QuerySpec", "register"]
