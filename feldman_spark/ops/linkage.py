"""Fuzzy entity linkage: blocked edit-distance record matching.

Beyond-reference capability (the reference joins only on exact
identity columns — ``coring/affine.py:47-54``). The classic two-stage
entity-resolution shape:

1. **Blocking** — candidate pairs come from a shuffled equi-join on a
   cheap deterministic block key (lowercased name prefix), plus a
   length-band residual (``abs(len(a) - len(b)) <= max_distance`` is a
   *necessary* condition for ``levenshtein <= max_distance``, so it
   only prunes true negatives). All-pairs O(N·M) never materializes;
   cost is the sum of per-block cross products.
2. **Matching** — JVM-codegen ``levenshtein`` on the candidates, then
   the best catalog match per probe via a ``min(struct(distance,
   id))`` aggregate: map-side partial aggregation, skew-immune (a hot
   probe never funnels through one reducer the way a ``row_number``
   window would).

Recall contract: a true match is found iff the first ``block_len``
characters survived the corruption — the standard prefix-blocking
trade-off; callers needing typo-robust first characters should union a
second blocking pass on a different key (e.g. a sorted-character or
phonetic key) over the same machinery.

At 100 TB both sides shuffle exactly once on the block key; the
match aggregate shuffles one row per candidate pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_link"]


def fuzzy_link(
    probes: DataFrame,
    catalog: DataFrame,
    probe_id: str,
    probe_name: str,
    cat_id: str,
    cat_name: str,
    block_len: int = 4,
    max_distance: int = 2,
) -> DataFrame:
    """Link each probe row to its best catalog row by edit distance.

    Returns ``(probe_id, probe_name, cat_id, cat_name, distance)`` —
    one row per probe that found a candidate within ``max_distance``;
    ties on distance break on ascending ``cat_id``.
    """
    overlap = {probe_id, probe_name} & {cat_id, cat_name}
    if overlap:
        raise ValueError(
            f"fuzzy_link: overlapping column names {sorted(overlap)}; "
            "rename one side first")

    def keyed(df: DataFrame, name_col: str) -> DataFrame:
        return df.withColumn(
            "_blk", F.substring(F.lower(F.col(f"`{name_col}`")), 1, block_len)
        )

    p = keyed(probes.select(probe_id, probe_name), probe_name)
    c = keyed(catalog.select(cat_id, cat_name), cat_name).withColumnRenamed(
        "_blk", "_cblk"
    )
    cand = (
        p.join(c, p["_blk"] == c["_cblk"], "inner")
        .filter(
            F.abs(
                F.length(F.col(f"`{probe_name}`"))
                - F.length(F.col(f"`{cat_name}`"))
            )
            <= max_distance
        )
        .withColumn(
            "_dist",
            F.levenshtein(
                F.lower(F.col(f"`{probe_name}`")),
                F.lower(F.col(f"`{cat_name}`")),
            ),
        )
        .filter(F.col("_dist") <= max_distance)
    )
    best = (
        cand.groupBy(probe_id, probe_name)
        .agg(
            F.min(
                F.struct(
                    F.col("_dist").alias("distance"),
                    F.col(f"`{cat_id}`").alias("cid"),
                    F.col(f"`{cat_name}`").alias("cname"),
                )
            ).alias("_best")
        )
        .select(
            probe_id,
            probe_name,
            F.col("_best.cid").alias(cat_id),
            F.col("_best.cname").alias(cat_name),
            F.col("_best.distance").alias("distance"),
        )
    )
    return best
