from .base import Q
from .catalog import all_queries

__all__ = ["Q", "all_queries"]
