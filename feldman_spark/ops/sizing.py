"""Catalyst plan-size probing for size-adaptive operator routing.

Several operators choose between a small-input shape (no persist, simple
sort) and a large-input shape (persisted shared subtree, binned/union
rewrites) by Catalyst's optimized-plan size estimate. The estimate costs
no data access — it is pure plan metadata — but it has two failure
modes the gates must agree on:

* non-JVM-backed or exotic plans (Spark Connect, mocked frames) raise —
  treat as UNKNOWN;
* stat-less leaves (``LogicalRDD`` from ``createDataFrame``, some
  streaming sources) report ``spark.sql.defaultSizeInBytes`` which
  defaults to ``Long.MaxValue`` — an implausible sentinel, not a
  measurement. Before this check, tiny RDD-backed inputs always took
  the large-input path, the direction measured 2-2.3x slower at small
  scale.

Both map to 0 ("assume small"): the small-input shape is the one whose
worst case is mild (an extra pass over a small input), while the
large-input shape's fixed costs (persist materialization, serialized
fused stages) are only paid back by genuinely large inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["plan_size_estimate", "SIZE_UNKNOWN_SENTINEL"]

# Anything at or above this is not a measurement: Catalyst's fallback for
# stat-less leaves is defaultSizeInBytes = Long.MaxValue (2^63-1), and any
# propagated product of it stays astronomically large. Real corpora at
# 100 TB are ~2^47; 2^60 (~1.15 EB) is safely past any plausible estimate.
SIZE_UNKNOWN_SENTINEL = 1 << 60


def plan_size_estimate(df: DataFrame) -> int:
    """Catalyst ``optimizedPlan().stats().sizeInBytes()`` for ``df``,
    with 0 returned for UNKNOWN — either the probe raised (non-JVM
    plans) or the estimate is the stat-less-leaf sentinel
    (>= ``SIZE_UNKNOWN_SENTINEL``). Callers route ``est > threshold``
    to the large-input shape, so 0 always selects the small-input path.
    """
    try:
        est = int(df._jdf.queryExecution().optimizedPlan()
                  .stats().sizeInBytes())
    except Exception:  # non-JVM-backed or exotic plans: assume small
        return 0
    if est >= SIZE_UNKNOWN_SENTINEL:
        return 0  # stat-less-leaf sentinel, not a measurement
    return est
