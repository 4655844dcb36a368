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
  finely enough: hot keys get a uniform salt in [0, buckets) on the left
  and a ×buckets replication on the right, spreading each hot key over
  ``buckets`` tasks — while every other key takes the normal unsalted
  join. Replication cost is paid ONLY for the hot subset.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "heavy_hitters"]

SALT = "_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    buckets: int = 16,
    how: str = "inner",
    seed: int = 42,
    hot_threshold: Optional[int] = None,
    hot_keys: Optional[DataFrame] = None,
) -> DataFrame:
    """Equi-join with skewed (hot) keys spread across ``buckets`` salt
    partitions. Result is row-identical to ``left.join(right, on, how)``
    for inner/left joins — salting is a physical rewrite, never a
    semantic one.

    Hot-key selection (first match wins):

    * ``hot_keys`` — a DataFrame of the ``on`` columns, e.g. from prior
      profiling of the key histogram; no extra pass over ``left``.
    * ``hot_threshold`` — derive hot keys as left keys with more than
      this many rows (one key-count aggregate over the left: 8-byte
      partials with map-side combine — cheap next to the join itself).
    * neither — salt EVERY key (the right side inflates ×``buckets``;
      only sensible when the right is a pruned projection and the whole
      key space is hot, e.g. a low-cardinality uniformly-hot key).

    The two-path plan: hot left rows get ``rand(seed)*buckets`` salts and
    join the hot right rows replicated per bucket; cold rows join the
    cold right rows unsalted; results union. The hot-key set broadcasts
    into map-side semi/anti routing joins, so routing itself shuffles
    nothing. A hot key missing from ``right`` still emits exactly one
    null-extended row under ``how='left'`` (its single salt bucket joins
    the replicated-right bucket and misses).

    100 TB posture: replication is O(|hot keys| × buckets) right rows —
    bounded by the skew you are treating, not the table size.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    on = list(on)

    def _salt_all(lf: DataFrame, rt: DataFrame) -> DataFrame:
        lf_s = lf.withColumn(SALT, (F.rand(seed) * buckets).cast("int"))
        rt_s = rt.withColumn(
            SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
        return lf_s.join(rt_s, on + [SALT], how).drop(SALT)

    if hot_keys is None and hot_threshold is None:
        return _salt_all(left, right)

    if hot_keys is None:
        hot_keys = (
            left.groupBy(*on).agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > int(hot_threshold)).select(*on)
        )
    hot = F.broadcast(hot_keys.select(*on).distinct())

    left_hot = left.join(hot, on, "left_semi")
    left_cold = left.join(hot, on, "left_anti")
    right_hot = right.join(hot, on, "left_semi")
    right_cold = right.join(hot, on, "left_anti")

    hot_joined = _salt_all(left_hot, right_hot)
    cold_joined = left_cold.join(right_cold, on, how)
    return hot_joined.unionByName(cold_joined)


def heavy_hitters(
    df: DataFrame,
    cols: Sequence[str],
    min_count: int,
    support: Optional[float] = None,
    count_col: str = "n",
) -> DataFrame:
    """EXACT frequent keys — every distinct value of ``cols`` appearing at
    least ``min_count`` times, with its exact count — found at a fraction
    of a full group-by's shuffle (beyond reference; the profiling pass
    that feeds :func:`salted_join`'s ``hot_keys``).

    Sketch-then-verify, the same contract as ``bloom_semi_join`` and the
    ngram candidate guard: a one-pass Karp–Papadimitriou–Shenker sketch
    (``DataFrame.stat.freqItems``) yields a SUPERSET of everything above
    ``support`` (driver-side list, ≤ 1/support items by construction),
    then the exact count runs only over rows matching those candidates —
    so the aggregate's shuffle carries the hot keys' partial counts
    instead of one row per DISTINCT key. At corpus scale (billions of
    distinct user ids / URLs, a handful hot) the distinct-key shuffle is
    the entire cost of naive profiling; this replaces it with
    (candidates × partitions) partial rows. False candidates are removed
    by the exact HAVING; false negatives cannot occur while ``support``
    ≤ min_count/N (caller guarantees — pass the corpus-size-derived
    value, or the conservative default below for unknown N).

    ``support`` defaults to ``1e-4`` (freqItems' floor), i.e. exactness
    holds for any corpus where ``min_count``/N ≥ 1e-4; tighten it when N
    is known to shrink the candidate list.
    """
    ks = list(cols)
    if support is None:
        support = 1e-4
    if not 0 < support < 1:
        raise ValueError(f"support must be in (0, 1), got {support}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")

    # freqItems sketches each column independently; for compound keys the
    # candidate set is the cross of per-column candidates — still a
    # superset (a frequent tuple needs every component frequent)
    fi = df.stat.freqItems(ks, support=support).first()
    cand = {c: list(fi[f"{c}_freqItems"]) for c in ks}
    pred = F.lit(True)
    for c in ks:
        pred = pred & F.col(c).isin(cand[c])
    return (
        df.filter(pred)
        .groupBy(*ks)
        .agg(F.count("*").alias(count_col))
        .filter(F.col(count_col) >= F.lit(int(min_count)))
    )
