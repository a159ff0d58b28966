"""Pregel core machinery shared by all algorithm drivers (SURVEY §2.B).

The BSP mapping (SURVEY §1.1): one Spark *action* per superstep is the
barrier; the shuffle produced by `groupBy(dst)` is message delivery;
Catalyst's partial+final HashAggregate is the combiner; a driver-side
scalar from `agg(...).first()` is the global aggregator.

The one Spark-specific hazard of iterative dataflow is unbounded plan
growth: superstep S's DataFrame references S-1's, so after ~30
supersteps analysis/optimization time dominates. `truncate_lineage`
cuts the plan every superstep via localCheckpoint (eager) — the
materialized blocks also serve as the per-superstep state cache. A
durable checkpoint (checkpoint.py) additionally persists state every k
supersteps for mid-iteration resume (B9/B10).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def truncate_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut df's logical plan via localCheckpoint (B1 plan-growth control).

    eager=False is the fast path inside superstep loops: the checkpoint
    materializes lazily inside the SAME job as the delta/active
    aggregation that follows — one Spark action per superstep instead
    of two, which matters when supersteps are overhead-bound.
    """
    return df.localCheckpoint(eager=eager)


@dataclass
class SuperstepLog:
    """Per-superstep driver-side metrics (B13's driver half)."""

    superstep: int
    delta: float | None
    active: int | None
    wall_s: float


@dataclass
class RunInfo:
    """Result metadata returned by every algorithm driver."""

    algorithm: str
    supersteps: int = 0
    converged: bool = False
    final_delta: float | None = None
    log: list[SuperstepLog] = field(default_factory=list)
    wall_s: float = 0.0

    def record(
        self, superstep: int, t0: float, delta: float | None = None, active: int | None = None
    ) -> None:
        w = time.monotonic() - t0
        self.log.append(SuperstepLog(superstep, delta, active, w))
        self.supersteps = superstep
        self.wall_s += w
        if delta is not None:
            self.final_delta = delta
