"""Query registry — the engine's declared capability surface.

The reference's only "plan" is a hand-wired pair of Hadoop jobs
(ProcessData.java:650-678). Here every capability from SURVEY.md §2 (Tables A
and B) is a named, registered query: a Python callable building a lazy
DataFrame plan (Catalyst optimizes it), plus — where SQL-expressible — an
equivalent ANSI-SQL oracle string for the DuckDB differential gate.

``__spark_entry__.queries()`` / ``oracle_sql()`` and the pytest suite both read
from this registry, so one declaration drives correctness, bench, and docs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    #: DuckDB-compatible ANSI SQL equivalent; ``None`` for non-SQL-expressible
    #: operators (driver then records a weaker rows-only check).
    oracle: str | None
    category: str
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None = None,
    category: str = "relational",
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query under ``name``.

    The wrapped function takes ``(spark, sf_dir)`` and returns a DataFrame.
    Column names in the DataFrame and the oracle SQL must agree (the driver
    sorts columns by name before value-hashing).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, category, description or (fn.__doc__ or "").strip(), tags)
        return fn

    return deco


def _ensure_loaded() -> None:
    # Operator modules self-register on import; keep imports here (not module
    # top level) to avoid circular imports with the operators package.
    from ..operators import (  # noqa: F401
        dedup,
        llm_pipeline,
        multimodal,
        relational,
        relational2,
        relational3,
        similarity,
        text,
        udf_surface,
        vectors,
    )
    from ..streaming import windows  # noqa: F401


def all_queries() -> dict[str, Query]:
    _ensure_loaded()
    return dict(_REGISTRY)


def get_query(name: str) -> Query:
    _ensure_loaded()
    return _REGISTRY[name]


def queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}
