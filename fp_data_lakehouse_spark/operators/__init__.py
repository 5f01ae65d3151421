"""Operator corpus. Importing this package registers every query into
``registry.REGISTRY`` (relational corpus + extension operators)."""

from . import relational  # noqa: F401  (registration side effect)
from .registry import REGISTRY, oracle_sql, queries

# Extension modules register on import; keep imports tolerant so a broken
# extension never takes down the whole corpus surface — but NEVER silently:
# a swallowed failure shrinks ``queries()`` and the driver would just see
# fewer queries. Failures are warned here and the exact registry size is
# pinned by tests/test_oracle_parity.py::test_registry_contract.
import warnings as _warnings

for _mod in (
    "textops",
    "dedup",
    "similarity",
    "eventops",
    "sketches",
    "asof",
    "rangejoin",
    "groupedmap",
    "sampling",
    "etlquery",
    "versionquery",
    "curation",
    "dataquality",
    "graph",
    "layout",
    "skew",
    "io",
    "deltaquery",
    "icebergquery",
    "streamquery",
):
    try:
        __import__(f"{__name__}.{_mod}")
    except ImportError as _exc:  # pragma: no cover - only on broken envs
        _warnings.warn(f"operator extension {_mod!r} failed to import: {_exc}", stacklevel=1)

try:  # multimodal registry surface lives in its own package
    __import__("fp_data_lakehouse_spark.multimodal.queries")
except ImportError as _exc:  # pragma: no cover - only on broken envs
    _warnings.warn(f"multimodal query surface failed to import: {_exc}", stacklevel=1)

__all__ = ["REGISTRY", "queries", "oracle_sql"]
