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

__all__ = ["bm25_topk", "bm25_rerank", "tokenize_query"]


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


def bm25_rerank(
    df: DataFrame,
    query: str,
    k: int = 10,
    n_candidates: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    weights: tuple = (0.5, 0.2, 0.3),
    round_digits: int = 4,
) -> DataFrame:
    """Retrieve-then-rerank: BM25 selects ``n_candidates`` documents
    cheaply, then a RICHER relevance function rescsores only those
    candidates — the two-stage shape of every production search stack
    (a cross-encoder or LLM judge slots in exactly where the feature
    formula sits; this deterministic stand-in keeps the stage
    value-oracle-checkable). The second-stage features go beyond the
    bag-of-words BM25 can see:

    * ``coverage`` — fraction of distinct query terms present (AND-ness);
    * ``phrase_hits`` — count of adjacent query-term bigrams appearing
      adjacently in the document (proximity);
    * ``first_pos`` — earliest match position (title/lead bias).

    ``rerank = bm25 + w0·coverage + w1·ln(1+phrase_hits) + w2/first_pos``
    rounded to ``round_digits`` before ordering; ties break on id.
    Returns ``(id_col, score, rerank_score, rank)``.

    Scale (100 TB): stage 1 is :func:`bm25_topk`'s one-scan shape; stage
    2 joins the BROADCAST candidate list back to the corpus (a base-table
    broadcast-hash-join probe — at scale this is where a doc-store point
    lookup or Z-ordered id index slots in; see io/parquet.py::read_pruned)
    and evaluates features on ``n_candidates`` rows only. The HOF lambdas
    here are fine precisely because they run on the candidate set, never
    the corpus.
    """
    if k < 1 or n_candidates < k:
        raise ValueError(
            f"bm25_rerank: need 1 <= k <= n_candidates (got k={k}, "
            f"n_candidates={n_candidates})")
    terms = tokenize_query(query)
    bigrams = list(zip(terms, terms[1:]))
    w0, w1, w2 = weights
    cands = bm25_topk(df, query, k=n_candidates, id_col=id_col,
                      text_col=text_col, k1=k1, b=b,
                      round_digits=round_digits).drop("rank")
    docs = df.select(id_col, text_col).join(F.broadcast(cands), id_col)

    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    coverage = (
        F.size(F.array_intersect(F.array_distinct(toks),
                                 F.array(*[F.lit(t) for t in terms])))
        .cast("double") / F.lit(float(len(terms))))
    phrase_hits = F.lit(0).cast("bigint")
    if bigrams:
        heads = F.slice(toks, 1, F.size(toks) - 1)
        tails = F.slice(toks, 2, F.size(toks) - 1)
        for a, bg in bigrams:
            phrase_hits = phrase_hits + F.when(
                F.size(toks) >= 2,
                F.size(F.filter(
                    F.zip_with(heads, tails,
                               lambda x, y: (x == a) & (y == bg)),
                    lambda v: v))).otherwise(F.lit(0)).cast("bigint")
    positions = F.array(*[F.array_position(toks, t) for t in terms])
    first_pos = F.array_min(F.filter(positions, lambda p: p > 0))

    scored = docs.select(
        id_col,
        "score",
        F.round(
            F.col("score")
            + F.lit(w0) * coverage
            + F.lit(w1) * F.log(F.lit(1.0) + phrase_hits)
            + F.lit(w2) / first_pos.cast("double"),
            round_digits,
        ).alias("rerank_score"),
    )
    topk = scored.orderBy(F.col("rerank_score").desc(), F.col(id_col)).limit(k)
    return topk.select(
        id_col, "score", "rerank_score",
        F.row_number()
        .over(Window.orderBy(F.col("rerank_score").desc(), F.col(id_col)))
        .alias("rank"),
    )
