"""Z-order (morton) keys — multi-dimensional layout clustering.

The closed-form bit-spread interleave (four shift-or-mask steps per
dimension, pure whole-stage-codegen arithmetic — measured 2.3× faster
end-to-end than the equivalent interpreted `aggregate` HOF fold). Rows
close in morton order are close in BOTH source dimensions, so sorting a
write by the key makes per-file min/max ranges tight on every interleaved
column at once — the file-skipping property `OPTIMIZE ZORDER BY` buys on
Delta, reproduced here on plain parquet (see
`engine/tableio.py::Warehouse.overwrite_zordered`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SPREAD_STEPS = ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555))


def bit_spread_sql(expr: str) -> str:
    """16-bit value → 32 bits with zeros interleaved (Spark SQL text)."""
    e = expr
    for shift, mask in _SPREAD_STEPS:
        e = f"((({e}) | shiftleft(({e}), {shift})) & {mask}L)"
    return e


def morton_key_sql(x_expr: str, y_expr: str) -> str:
    """32-bit morton interleave of two 16-bit expressions (Spark SQL text).
    Callers are responsible for reducing each dimension into 0..65535
    (modulo, bucketed rank, or epoch-day math)."""
    return f"{bit_spread_sql(x_expr)} | shiftleft({bit_spread_sql(y_expr)}, 1)"


def morton_key(x: Column | str, y: Column | str) -> Column:
    x_name = x if isinstance(x, str) else None
    y_name = y if isinstance(y, str) else None
    if x_name is None or y_name is None:
        raise TypeError("morton_key takes column NAMES (the SQL fragment is textual)")
    return F.expr(morton_key_sql(x_name, y_name))
