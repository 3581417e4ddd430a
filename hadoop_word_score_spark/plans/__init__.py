from . import queries
from .queries import REGISTRY, QuerySpec

__all__ = ["queries", "REGISTRY", "QuerySpec"]
