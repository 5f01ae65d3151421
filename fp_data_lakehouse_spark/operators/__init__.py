"""Operator corpus. Importing this package registers every query into
``registry.REGISTRY`` (relational corpus + extension operators)."""

from . import relational  # noqa: F401  (registration side effect)
from .registry import REGISTRY, oracle_sql, queries

# Extension modules register on import; keep imports tolerant so a broken
# extension never takes down the whole corpus surface.
for _mod in ("textops", "dedup", "similarity", "eventops", "sketches", "asof", "rangejoin", "groupedmap", "sampling"):
    try:
        __import__(f"{__name__}.{_mod}")
    except ImportError:
        pass

try:  # multimodal registry surface lives in its own package
    __import__("fp_data_lakehouse_spark.multimodal.queries")
except ImportError:
    pass

__all__ = ["REGISTRY", "queries", "oracle_sql"]
