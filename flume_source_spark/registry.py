"""Central query registry.

Every declared operator from SURVEY.md §2 registers here as a
:class:`QuerySpec`: a Spark DataFrame builder plus (when the operator
is SQL-expressible) an equivalent DuckDB oracle SQL string. The driver
contract (``__spark_entry__.queries()`` / ``oracle_sql()``) and the
local pytest oracle harness both iterate this registry, so one
registration is simultaneously the implementation, the correctness
gate, and the coverage inventory.

Canonicalization contract (FIXTURES.md §A): results are compared
order-insensitively with columns sorted by name, so
- every computed column is aliased identically in Spark and SQL,
- double aggregates are rounded (4 dp default) on BOTH sides,
- timestamps are cast to ISO strings or dates in outputs,
- any LIMIT/top-k query carries a total ORDER BY (unique tiebreak)
  so both engines select the same rows.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: QueryBuilder
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator registering a query builder under ``name``."""

    def deco(fn: QueryBuilder) -> QueryBuilder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query-defining module so REGISTRY is fully populated."""
    import flume_source_spark.operators.relational  # noqa: F401
    import flume_source_spark.operators.relational2  # noqa: F401
    import flume_source_spark.operators.skew  # noqa: F401
    import flume_source_spark.operators.maintenance  # noqa: F401
    import flume_source_spark.operators.ansi_safety  # noqa: F401
    import flume_source_spark.operators.joins  # noqa: F401
    import flume_source_spark.operators.aggregates  # noqa: F401
    import flume_source_spark.operators.windows  # noqa: F401
    import flume_source_spark.operators.setops  # noqa: F401
    import flume_source_spark.operators.scalars  # noqa: F401
    import flume_source_spark.operators.subqueries  # noqa: F401
    import flume_source_spark.pipeline.dedup  # noqa: F401
    import flume_source_spark.pipeline.similarity  # noqa: F401
    import flume_source_spark.pipeline.text  # noqa: F401
    import flume_source_spark.pipeline.multimodal  # noqa: F401
    import flume_source_spark.streaming.batch_equiv  # noqa: F401
    import flume_source_spark.sources.filemeta_queries  # noqa: F401
    import flume_source_spark.sources.formats  # noqa: F401
    import flume_source_spark.functions.udfs  # noqa: F401
    return REGISTRY
