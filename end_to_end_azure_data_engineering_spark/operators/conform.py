"""Conform (typed projection) operator — SURVEY §2.2 P1-P3.

The reference's silver notebooks each open with a fixed-order ``select`` of
per-column cast+alias (reference: 4_silver/silver_transactions.py:73-87,
incl. the deliberate decimal→double downcast), a literal ``source_system``
tag injected at read time (:59,64), and deterministic surrogate keys
``concat_ws('-', natural_id, source_system)`` that preserve NULL
(:88-93). Here that is one declarative spec applied as a single Project —
Catalyst prunes the scan to exactly the referenced columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ConformSpec:
    """Declarative conform step for one entity.

    columns: output name -> (source column, spark type name). Order fixed.
    surrogate_keys: output name -> natural-id column (already conformed name);
        key = concat_ws('-', natural_id, source_system), NULL-preserving.
    """

    columns: dict[str, tuple[str, str]]
    surrogate_keys: dict[str, str] = field(default_factory=dict)


def conform(df: DataFrame, spec: ConformSpec, source_system: str) -> DataFrame:
    """Apply typed projection + source tag + surrogate keys in one pass."""
    cols: list[Column] = [
        F.col(src).cast(typ).alias(out) for out, (src, typ) in spec.columns.items()
    ]
    cols.append(F.lit(source_system).alias("source_system"))
    out = df.select(*cols)
    for key_name, natural in spec.surrogate_keys.items():
        out = out.withColumn(
            key_name,
            F.when(F.col(natural).isNull(), F.lit(None).cast("string")).otherwise(
                F.concat_ws("-", F.col(natural), F.col("source_system"))
            ),
        )
    return out


def harmonize_union(dfs: list[DataFrame]) -> DataFrame:
    """U1 — unionByName with allowMissingColumns=True
    (reference: 4_silver/silver_transactions.py:67): multi-source schema
    harmonization; columns missing from one source are null-filled.
    """
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
