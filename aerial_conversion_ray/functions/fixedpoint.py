"""Exact distributed aggregation via fixed-point integers.

Floating-point sums depend on accumulation order, so a distributed
partial-aggregate tree and a sequential oracle scan produce different
last-ulp results.  The engine therefore defines money/measure
aggregates over SCALED INT64 values:

    fixed = floor(x * scale + 0.5)        (identical in numpy & SQL)
    sum   = exact int64 sum               (order-independent)
    out   = sum / scale                   (identical final double op)

This is a SEMANTIC choice of the engine's aggregate operators
(documented per query), not a fudge: both the Ray pipeline and the
DuckDB oracle state it explicitly, making results bit-reproducible
across any execution plan, cluster size, or partition order — a
requirement the north rule's "exact output equality at two cluster
sizes" imposes on any engine.
"""

from __future__ import annotations

import numpy as np


def to_fixed(x: np.ndarray, scale: float) -> np.ndarray:
    """floor(x * scale + 0.5) as int64 (half-up, exact SQL mirror)."""
    return np.floor(np.asarray(x, dtype=np.float64) * scale + 0.5).astype(np.int64)


def sql_fixed(expr: str, scale: float) -> str:
    return f"cast(floor(({expr}) * {scale!r} + 0.5) as bigint)"


def sql_unfixed(expr: str, scale: float) -> str:
    return f"(({expr}) / {scale!r})"
