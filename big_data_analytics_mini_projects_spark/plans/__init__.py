from .catalog import QUERIES, QuerySpec  # noqa: F401
