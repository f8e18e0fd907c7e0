"""Frame pinning — materialize once, choose the durability tier by
deployment.

Operators pin frames their downstream plan references repeatedly
(Catalyst plans DAG reuse as tree duplication — see the scan fan-out
fence) or that an iterative loop must cut lineage on (connected
components, k-means). Two Spark mechanisms exist and the right one is a
DEPLOYMENT property, not an operator property:

- ``localCheckpoint()``: blocks live on the executors that computed
  them; fastest (no extra write path), but the truncated lineage CANNOT
  be recomputed — any executor loss fails the job. Correct on
  ``local[*]`` (one process: losing the "executor" loses the driver
  anyway) and acceptable for short jobs on stable clusters.
- reliable ``checkpoint()``: blocks are written to the configured
  checkpoint directory (a shared filesystem at cluster scale) and
  survive executor loss — the right trade on a 1000-executor job where
  churn is ROUTINE over a multi-hour run; cleaned by the ContextCleaner
  when ``spark.cleaner.referenceTracking.cleanCheckpoints=true``.

``pin`` keys off ``SparkContext.getCheckpointDir()``: a cluster
deployment that calls ``setCheckpointDir`` (standard practice — it is
also required before any reliable checkpoint) automatically upgrades
EVERY pin site in this package to the fault-tolerant tier, with no
operator code change. Without a dir (the local test/bench default)
behavior is byte-identical to the previous direct localCheckpoint
calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["pin"]


def pin(df: DataFrame, *, reliable: bool | None = None) -> DataFrame:
    """Eagerly materialize ``df`` and return the pinned frame.

    ``reliable=None`` (default) auto-detects: reliable ``checkpoint()``
    when the SparkContext has a checkpoint dir configured, else
    ``localCheckpoint()``. Explicit True/False forces the tier (True
    requires a configured checkpoint dir, as Spark itself enforces)."""
    if reliable is None:
        reliable = (
            df.sparkSession.sparkContext.getCheckpointDir() is not None
        )
    return df.checkpoint() if reliable else df.localCheckpoint()
