from .catalog import CATALOG, QuerySpec

__all__ = ["CATALOG", "QuerySpec"]
