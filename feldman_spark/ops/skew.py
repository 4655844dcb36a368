"""Skew mitigation for large-large joins.

The Feldman-domain joins broadcast their small side and are skew-immune;
this module covers the beyond-reference case: joining two *large* tables
on a key whose distribution is heavy-tailed (e.g. joining events to a
large dimension keyed by a power-law user id at corpus scale).

Two complementary tools:

* AQE skew-join splitting is ON by default in :func:`feldman_spark.get_spark`
  (``spark.sql.adaptive.skewJoin.enabled``) — it splits oversized
  sort-merge partitions at runtime and is the first line of defense.
* :func:`salted_join` handles the pathological key that AQE cannot split
  finely enough: the left (skewed) side gets a uniform random salt in
  [0, buckets); the right side is replicated once per bucket; the join key
  becomes (key, salt), spreading one hot key over ``buckets`` tasks.
  Cost: right side inflates ×buckets — use on the pruned/projected right.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]

SALT = "_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    buckets: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the left side's hot keys spread across ``buckets``
    salt partitions. Result is row-identical to ``left.join(right, on,
    how)`` for inner/left joins on unique-ish right keys."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    left_s = left.withColumn(SALT, (F.rand(seed) * buckets).cast("int"))
    right_s = right.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    out = left_s.join(right_s, list(on) + [SALT], how)
    return out.drop(SALT)
