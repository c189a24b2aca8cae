from .catalog import CATALOG, QuerySpec
from . import llm_catalog as _llm

if not any(s.tags and "llm" in s.tags for s in CATALOG):
    CATALOG.extend(_llm.LLM_CATALOG)

__all__ = ["CATALOG", "QuerySpec"]
