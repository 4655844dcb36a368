"""Learned quality classification — the fastText-classifier stage of
crawl curation (beyond reference).

Production pipelines (CCNet, GPT-3 appx. A, LLaMA) filter crawl text
with a LEARNED classifier: train on a trusted positive set (curated
corpora) vs raw crawl negatives, keep documents the model scores high.
The rule-based scores in :mod:`feldman_spark.pipeline.text` are the
bootstrap; this module distills them (or any label) into a hashed
bag-of-words linear model with ``pyspark.ml`` — the same
train-on-labels / score-the-corpus shape as the production fastText
step, minus the subword embeddings.

Scale (100 TB): training runs on a SAMPLE (classifiers need ~10⁵-10⁶
labeled docs, never the corpus — ``hash_sample`` provides the
deterministic slice); each L-BFGS iteration is one ``treeAggregate``
pass over the sample. SCORING is the corpus-sized side and is embarrassingly
parallel: the fitted model is a broadcast weight vector applied
row-locally by ``model.transform`` — one scan, no shuffle. The hashed
feature space (``HashingTF``, 2^18 default) keeps the model a fixed-size
dense vector regardless of vocabulary growth, exactly like DSIR's
fixed-bucket form.

Determinism note: L-BFGS over a fixed sample is deterministic for a
fixed partitioning but float-summation-order sensitive across cluster
layouts, so scores carry no cross-engine value oracle — correctness is
pinned by pytest (perfectly separable data → exact label recovery;
rule-distillation agreement floor; save/load round-trip) like the other
non-SQL-expressible operators.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["train_quality_classifier", "score_quality"]


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    num_features: int = 1 << 18,
    reg_param: float = 1e-3,
    max_iter: int = 50,
):
    """Fit the hashed bag-of-words logistic model on ``labeled``
    (``label_col`` ∈ {0.0, 1.0}). Returns a fitted
    ``pyspark.ml.PipelineModel`` (use ``.save(path)`` /
    ``PipelineModel.load`` for reuse across jobs)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="_words", pattern=r"\s+",
        toLowercase=True)
    tf = HashingTF(
        inputCol="_words", outputCol="_features",
        numFeatures=int(num_features))
    lr = LogisticRegression(
        featuresCol="_features", labelCol=label_col,
        regParam=float(reg_param), maxIter=int(max_iter),
        standardization=False)
    return Pipeline(stages=[tok, tf, lr]).fit(labeled)


def score_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    score_col: str = "quality_prob",
    keep_threshold: Optional[float] = None,
) -> DataFrame:
    """Score ``df`` with a fitted classifier: adds ``score_col`` (the
    positive-class probability, row-local broadcast-model transform) and,
    when ``keep_threshold`` is given, filters to rows at or above it —
    the corpus-side keep/drop pass."""
    from pyspark.ml.functions import vector_to_array

    cols = df.columns
    scored = model.transform(df)
    pos = F.element_at(vector_to_array(F.col("probability")), 2)
    out = scored.select(*cols, pos.alias(score_col))
    if keep_threshold is not None:
        out = out.filter(F.col(score_col) >= float(keep_threshold))
    return out
