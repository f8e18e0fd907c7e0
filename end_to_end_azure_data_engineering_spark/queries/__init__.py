"""Query registry — the driver-facing surface.

Each query module registers named queries with ``register``. A query is:
  - a callable ``(spark, sf_dir) -> DataFrame`` built with the engine's
    operators (idiomatic DataFrame/SQL, Catalyst-optimized), and
  - optionally an ANSI-SQL oracle string DuckDB can run over the same
    parquet tables (pre-registered views) for hash-comparison.

Column names are aligned between both sides (the driver sorts columns by
name before hashing), so every computed column is aliased identically.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a query callable (and its DuckDB oracle SQL)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (columnar parquet scan; pushdown-friendly).

    ``events.ts`` is parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as epoch-nanos LONG
    and is converted here to a microsecond TIMESTAMP (truncating, matching
    DuckDB's ns→us cast).
    """
    if name == "events":
        # set at runtime too: the driver passes its own session, which won't
        # have the factory default from engine.session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all_queries() -> None:
    """Import every query module so registration side-effects run."""
    from . import relational  # noqa: F401
    from . import relational_ext  # noqa: F401
    from . import relational_tpch2  # noqa: F401
    from . import dedup_ops  # noqa: F401
    from . import text_ops  # noqa: F401
    from . import similarity_ops  # noqa: F401
    from . import pipeline_ops  # noqa: F401
    from . import streaming_batch_ops  # noqa: F401
    from . import multimodal_ops  # noqa: F401
