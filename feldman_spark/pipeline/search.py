"""Full-text retrieval over a document corpus: BM25 top-k search.

Beyond-reference capability (the reference has no text search;
feldman.py is a depth-splicing tool). The classic Okapi BM25 ranking
function (Robertson & Walker 1994; the Lucene-default ``k1=1.2,
b=0.75`` parametrization) re-expressed for Spark's execution model:

- **The corpus text never shuffles.** Document length is a row-local
  ``size(split(...))``; the token stream is an exploded codegen
  generator that is filtered to the (tiny) query vocabulary *inside*
  the same whole-stage-codegen pipeline, so only query-term hits —
  a few rows per matching document — reach the term-frequency
  aggregate.
- **Corpus statistics stay relational.** ``N`` / ``avgdl`` are one
  tiny aggregate crossJoin-broadcast back; per-term document
  frequencies are a second tiny aggregate joined onto the hit stream
  by term (broadcast — at most ``len(query)`` rows). No ``collect()``
  anywhere; the whole plan is one corpus scan for stats and one for
  scoring.
- **Top-k is TakeOrdered**, not a global sort: per-partition heaps of
  size k, one k-row reduce at the driver side of the action.

At 100 TB the expensive side (tokenize + filter) is embarrassingly
parallel map work; the only shuffles move query-term hit counts
(|matching docs| x |query terms| rows of three scalars).
"""

from __future__ import annotations

import re
from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["bm25_topk", "tokenize_query"]


def tokenize_query(query: str) -> List[str]:
    """Lowercased whitespace tokens, de-duplicated, order-preserving —
    the same tokenization the scorer applies to documents."""
    seen = {}
    for t in re.split(r"\s+", query.strip().lower()):
        if t and t not in seen:
            seen[t] = None
    return list(seen)


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: Optional[int] = 4,
) -> DataFrame:
    """Top-``k`` documents for ``query`` under Okapi BM25.

    ``idf(t) = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))`` (the
    non-negative Lucene form), ``score(d) = sum_t idf(t) * tf * (k1+1)
    / (tf + k1 * (1 - b + b * dl/avgdl))``. Scores are rounded to
    ``round_digits`` **before** ranking so the ordering is stable
    across engines and float summation orders; ties break on
    ``id_col`` ascending. Returns ``(id_col, score, rank)``.
    """
    terms = tokenize_query(query)
    if not terms:
        raise ValueError("bm25_topk: empty query")

    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = df.select(
        F.col(id_col),
        F.when(F.trim(F.col(text_col)) == "", F.lit(0))
        .otherwise(F.size(toks))
        .cast("bigint")
        .alias("_dl"),
        toks.alias("_toks"),
    )

    # corpus stats: one tiny aggregate, broadcast back (no collect)
    stats = base.agg(
        F.count("*").alias("_n_docs"),
        F.avg("_dl").alias("_avgdl"),
    )

    # codegen token stream, filtered to the query vocabulary before any
    # exchange: only query-term hits leave the scan stage
    hits = (
        base.select(id_col, "_dl", F.explode("_toks").alias("_term"))
        .filter(F.col("_term").isin(terms))
    )
    tf = hits.groupBy(id_col, "_dl", "_term").agg(
        F.count("*").cast("double").alias("_tf")
    )

    # per-term document frequency: at most len(terms) rows
    dfreq = tf.groupBy("_term").agg(F.count("*").cast("double").alias("_df"))

    scored = (
        tf.join(F.broadcast(dfreq), "_term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("_n_docs") - F.col("_df") + F.lit(0.5))
                / (F.col("_df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_contrib",
            F.col("_idf")
            * F.col("_tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("_tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("_dl") / F.col("_avgdl")
                )
            ),
        )
        .groupBy(id_col)
        .agg(F.sum("_contrib").alias("score"))
    )
    if round_digits is not None:
        scored = scored.withColumn("score", F.round("score", round_digits))
    topk = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    # rank over the k-row survivor set (single tiny partition by design)
    return topk.select(
        id_col,
        "score",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col(id_col)))
        .alias("rank"),
    )
