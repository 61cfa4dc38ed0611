"""Query registry backing /root/repo/__spark_entry__.py.

Each declared query from SURVEY.md §2 registers here with its Spark
implementation and (where SQL-expressible) its DuckDB oracle SQL. The
driver runs both at sf0.01 and compares row-count + schema +
order-insensitive value hash, so:

- every computed column is aliased identically in Spark and SQL;
- floating aggregates are rounded (round 4) on BOTH sides so FP
  summation-order differences between engines can't flip the hash;
- window orderings always include a unique tiebreaker key;
- genuinely non-SQL-expressible ops register with ``oracle=None`` and
  get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None for rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a declared query (and optional DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def _load_all() -> None:
    """Import every query module (side effect: registration)."""
    from laser_hadoop_spark import queries  # noqa: F401

    queries.load_all()


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {n: s.oracle for n, s in _REGISTRY.items() if s.oracle is not None}


def get(name: str) -> QuerySpec:
    _load_all()
    return _REGISTRY[name]


def specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)
