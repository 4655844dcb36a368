"""Deterministic sampling and dataset splitting for training pipelines.

Beyond-reference capability. Everything is driven by an md5 of the row
key plus a seed string, so results are:

* deterministic across runs and engines (the DuckDB oracle reproduces
  them bit-for-bit — no RNG state, no partition-order dependence);
* stable under corpus growth: a document keeps its split/sample fate
  when new rows arrive, the property that keeps eval sets uncontaminated
  across re-crawls;
* one column expression — no shuffle, no UDF, fully pushdown-friendly.

The uniform variate is the md5 hex prefix compared lexicographically:
md5 is uniform over [0, 16^32), so ``substr(md5(key||'#'||seed), 1, 8)``
is uniform over 8-hex-digit strings and ``prefix < threshold`` selects a
fraction with 1/16^8 granularity.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hash_variate", "hash_sample", "hash_split", "weighted_mix",
           "dsir_weights",
           "temperature_mix",
    "budget_mix", "cap_per_group", "epoch_shuffle",
           "stratified_sample", "weighted_sample_per_group",
           "rebalance_to_target"]

_PREFIX_LEN = 8  # 16^8 ~ 4.3e9 granularity


def _threshold(fraction: float) -> str:
    """The PREFIX_LEN-hex-digit threshold selecting ``fraction`` of a
    uniform hex-prefix variate. A fraction of 1.0 would need 16^8 — one
    past the largest 8-hex string — so it returns a sentinel that sorts
    after every hex digest ('g' > 'f'), keeping ``variate < threshold``
    true for all rows instead of silently truncating to '10000000'."""
    f = min(max(fraction, 0.0), 1.0)
    n = int(f * (16 ** _PREFIX_LEN))
    if n >= 16 ** _PREFIX_LEN:
        return "g" * _PREFIX_LEN
    return format(n, f"0{_PREFIX_LEN}x")


def hash_variate(key: Column, seed: str = "sample") -> Column:
    """Uniform deterministic variate for a row key: the first 8 hex
    digits of md5(key || '#' || seed). Different seeds give independent
    variates for the same key."""
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(f"#{seed}"))), 1, _PREFIX_LEN)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = "sample"
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash. Unlike
    ``DataFrame.sample`` this is reproducible across runs, engines and
    repartitioning, and a row's fate never changes as the corpus grows."""
    return df.filter(hash_variate(F.col(key_col), seed) < F.lit(_threshold(fraction)))


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Sequence[Tuple[str, float]] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Partition the corpus into named splits by key hash — the
    train/val/test primitive. Weights are normalized; every row lands in
    exactly one split; membership is stable under corpus growth."""
    total = sum(w for _, w in weights)
    v = hash_variate(F.col(key_col), seed)
    expr = F.lit(weights[-1][0])  # remainder catches rounding tail
    acc = 0.0
    cases = []
    for name, w in weights[:-1]:
        acc += w / total
        cases.append((name, _threshold(acc)))
    for name, thr in reversed(cases):
        expr = F.when(v < F.lit(thr), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def weighted_mix(
    sources: Dict[str, Tuple[DataFrame, float]],
    key_col: str,
    seed: str = "mix",
    source_col: str = "source",
) -> DataFrame:
    """Mix datasets at per-source sampling rates: each source is
    deterministically downsampled to its fraction and tagged. The union
    is a plan-level concat — no shuffle; downstream ops see one corpus."""
    parts = []
    for name, (df, fraction) in sources.items():
        parts.append(
            hash_sample(df, key_col, fraction, seed=f"{seed}:{name}")
            .withColumn(source_col, F.lit(name))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def temperature_mix(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    alpha: float = 0.5,
    target_rows: "int | None" = None,
    seed: str = "mixt",
) -> DataFrame:
    """Temperature-reweighted corpus mixing — the multilingual-LM
    sampling rule (exponentiated weighting, as in mBERT/T5/XLM-R data
    mixing): source ``s`` with ``n_s`` rows gets sampling weight
    ``p_s ∝ n_s^alpha``; with ``alpha < 1`` small sources are upweighted
    relative to their natural share (alpha=1 is proportional, alpha=0
    uniform across sources). Each source keeps the deterministic
    fraction ``f_s = min(1, round(target·p_s / n_s, 6))`` of its rows by
    hash variate, so membership is reproducible across runs/engines and
    stable per key. ``target_rows=None`` targets the current corpus
    size (pure re-balancing: big sources shrink to fund the small-source
    upweighting; the realized total lands near the target, not exactly —
    per-source rounding and capped sources absorb the difference).

    One tiny aggregate (per-source counts — |sources| rows to the
    driver), then a pure row-local filter against a broadcast
    source→threshold map: the corpus is scanned once, nothing shuffles.
    The 6-decimal round on ``f_s`` pins the thresholds across engines
    (summation order of the normalizer differs at the last ulp
    otherwise)."""
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    if not counts:
        return df
    z = sum(c ** alpha for _, c in sorted(counts.items()))
    total = float(target_rows if target_rows is not None
                  else sum(counts.values()))
    frac = {s: min(1.0, round(total * (c ** alpha) / z / c, 6))
            for s, c in counts.items()}
    thr = F.create_map(*[lit for s in sorted(counts)
                         for lit in (F.lit(s), F.lit(_threshold(frac[s])))])
    v = hash_variate(F.col(key_col), seed=seed)
    return df.filter(v < thr[F.col(source_col)])


def dsir_weights(
    df: DataFrame,
    target_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    alpha: float = 1.0,
    buckets: "int | None" = None,
    digits: int = 6,
) -> DataFrame:
    """Data Selection with Importance Resampling weights (DSIR, Xie et
    al. 2023, arXiv:2302.03169): score every raw document by how much
    more likely its word ``n``-gram features are under the TARGET
    distribution (rows where ``target_col`` is true — the trusted
    high-quality slice) than under the raw corpus — the published recipe
    for "select pretraining data that looks like the domain you care
    about". Each side is a Laplace-``alpha``-smoothed unigram model over
    gram features; a raw document's weight is its summed per-occurrence
    log-likelihood ratio, rounded to ``digits``. Resample by taking the
    top-k (deterministic; the paper adds Gumbel noise for a stochastic
    draw — inject it on top of the returned weights if wanted).

    Returns ``(id_col, weight)`` for raw (non-target) documents with at
    least one gram; documents shorter than ``n`` words have no features
    and are omitted.

    Scale (100 TB): the corpus scans once into a codegen gram stream
    (explode + slice/concat_ws — grams are ≤ ``n`` words, the text never
    moves). With ``buckets=None`` the model table is gram-keyed: one
    gram shuffle for the two count models (map-side partial sums), one
    gram-keyed join of the raw stream against the per-gram log-ratio
    (AQE broadcasts it while the vocabulary is small), one id-keyed sum.
    The paper's production form is ``buckets=K`` (it uses 10k): grams
    hash into K fixed buckets, so the model table is EXACTLY K rows —
    it always broadcasts and the join shuffle disappears, leaving two
    corpus scans and the id-keyed sum regardless of vocabulary growth.
    The value oracle runs the raw-gram form (engine-portable); bucketed
    weights differ from raw-gram weights only by hash-collision noise,
    which is the published approximation."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    stream = (
        df.select(F.col(id_col), F.col(target_col).alias("_tgt"),
                  words.alias("_w"))
        .filter(F.size("_w") >= n)
        .select(
            id_col,
            "_tgt",
            F.explode(F.sequence(F.lit(1), F.size("_w") - (n - 1))).alias("_i"),
            "_w",
        )
        .select(
            id_col,
            "_tgt",
            F.concat_ws(" ", F.slice("_w", F.col("_i"), n)).alias("_g"),
        )
    )
    feat = (
        stream.withColumn(
            "_f", F.pmod(F.xxhash64("_g"), F.lit(buckets)).cast("string"))
        .drop("_g") if buckets else stream.withColumnRenamed("_g", "_f")
    )
    model = feat.groupBy("_f").agg(
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("_ct"),
        F.sum(F.when(F.col("_tgt"), 0).otherwise(1)).alias("_cr"),
    )
    # smoothing vocabulary: the FIXED bucket count when bucketed (empty
    # buckets are part of the model), the observed vocabulary otherwise
    totals = model.agg(
        F.sum("_ct").alias("_t"),
        F.sum("_cr").alias("_r"),
        (F.lit(int(buckets)) if buckets
         else F.count(F.lit(1))).cast("bigint").alias("_v"),
    )
    a = float(alpha)
    ratio = model.crossJoin(F.broadcast(totals)).select(
        "_f",
        (
            F.log((F.col("_ct") + a) / (F.col("_t") + a * F.col("_v")))
            - F.log((F.col("_cr") + a) / (F.col("_r") + a * F.col("_v")))
        ).alias("_lr"),
    )
    return (
        feat.filter(~F.col("_tgt"))
        .join(ratio, on="_f")
        .groupBy(id_col)
        .agg(F.bround(F.sum("_lr"), digits).alias("weight"))
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    key_col: str = "doc_id",
    seed: str = "cap",
) -> DataFrame:
    """At most ``cap`` rows per group — the per-domain/per-source cap of
    crawl pipelines (a handful of hosts otherwise dominate the corpus).

    Which rows survive is decided by the deterministic hash variate, NOT
    arrival order, so the kept set is stable across runs, partitionings,
    and corpus growth (a surviving row is only ever displaced by a
    lower-variate newcomer, never resampled at random). One shuffle on
    the group key; ties in the variate break by the key itself, so the
    result is total-order deterministic."""
    w = Window.partitionBy(group_col).orderBy(
        hash_variate(F.col(key_col), seed).asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    epoch: int = 0,
    num_shards: int = 8,
    seed: str = "shuffle",
    shard_col: str = "shard",
    sort_col: str = "sk",
) -> DataFrame:
    """Deterministic global reshuffle for training epochs: every row gets
    a ``(shard, sort_key)`` pair derived from ``md5(key # seed:epoch)``.
    The global training order for an epoch is "shards in index order,
    each shard sorted by ``sort_col``" — a total order that needs NO
    sequential row counter (a global ``row_number`` would funnel the
    corpus through one partition; shard + intra-shard sort expresses the
    same permutation and lets a 1000-executor job write every shard in
    parallel). A new ``epoch`` re-derives an independent permutation;
    rows keep their fate under corpus growth within an epoch.

    The shard index is the first FOUR hex digits of the variate modulo
    ``num_shards`` — the 16-bit prefix keeps the modulo bias below
    ``num_shards``/65536 (< 0.4% at 256 shards, vs a systematic ~4% at
    e.g. 10 shards from a single-byte prefix); production jobs with
    more output shards widen the prefix further. Pure column
    expressions — portable to the DuckDB oracle digit-for-digit, no
    shuffle in this operator itself (the downstream
    ``partitionBy(shard)`` write or ``repartition`` is where the data
    moves, exactly once).

    The 8-hex ``sort_col`` variate collides at birthday rates beyond
    ~100k rows; any consumer that needs a TOTAL order (e.g. the sharded
    export sink) must tiebreak on ``key_col`` — ties under a bare
    ``sort_col`` sort order nondeterministically.

    Raises if ``shard_col``/``sort_col`` already exist on ``df`` — a
    silent ``withColumn`` overwrite would corrupt the user's data (pass
    different names instead).
    """
    clash = {shard_col, sort_col} & set(df.columns)
    if clash:
        raise ValueError(
            f"epoch_shuffle: input already has column(s) {sorted(clash)}; "
            "pass shard_col=/sort_col= to use non-colliding names")
    v = hash_variate(F.col(key_col), seed=f"{seed}:{epoch}")
    prefix16 = F.conv(F.substring(v, 1, 4), 16, 10).cast("int")
    return df.withColumn(sort_col, v).withColumn(
        shard_col, (prefix16 % num_shards).cast("int"))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Dict[str, float],
    key_col: str = "doc_id",
    seed: str = "strata",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — ``sampleBy`` made
    reproducible: each stratum keeps its own fraction of rows, chosen by
    the hash variate rather than an RNG, so membership is stable across
    runs, partitionings, engines, and corpus growth (rebalancing a
    skewed-language corpus never resamples history). Strata absent from
    ``fractions`` keep ``default_fraction``.

    Scale shape: zero shuffles — the per-stratum threshold is a literal
    CASE chain over the (small, enumerated) strata and the keep test is
    one row-local string compare; the variate is seeded per stratum so
    co-keyed rows in different strata draw independently.
    """
    thr = F.lit(_threshold(default_fraction))
    for name, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == F.lit(name),
                     F.lit(_threshold(frac))).otherwise(thr)
    v = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f"#{seed}:"),
                       F.col(strata_col).cast("string"))), 1, _PREFIX_LEN)
    return df.filter(v < thr)


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    seed: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: ``k`` rows per group,
    each row's inclusion probability proportional to ``weight_col`` —
    the Efraimidis–Spirakis A-ES reservoir scheme (Inf. Process. Lett.
    97(5), 2006) made deterministic: rank by ``u^(1/w)`` descending
    (equivalently ``ln(u)/w``, computed that way to avoid overflow)
    where ``u`` is the row's md5 hash variate mapped into (0, 1).
    Membership is reproducible across runs, engines, partitionings, and
    corpus growth — a kept row is only displaced by a better-keyed
    newcomer, never resampled.

    Rows with NULL or non-positive weight are excluded. The ranking
    key is row-local; the top-k runs through
    :func:`feldman_spark.ops.windows.grouped_topk`, so a hot group
    pre-reduces per partition (candidates, not the corpus, shuffle).
    """
    from feldman_spark.ops.windows import grouped_topk

    # u in (0,1): (hex_prefix + 0.5) / 16^8 — never 0 (ln) or 1
    hx = F.conv(hash_variate(F.col(key_col), seed), 16, 10).cast("double")
    u = (hx + F.lit(0.5)) / F.lit(float(16 ** _PREFIX_LEN))
    es_key = F.log(u) / F.col(weight_col).cast("double")
    keyed = (
        df.filter(F.col(weight_col).isNotNull()
                  & (F.col(weight_col).cast("double") > 0))
        .withColumn("_es", es_key)
    )
    return grouped_topk(
        keyed, [group_col], "_es", k, tiebreak_cols=[key_col],
        descending=True,
    ).drop("_es")


def rebalance_to_target(
    df: DataFrame,
    group_col: str,
    targets: "dict[str, float]",
    key_col: str = "doc_id",
    seed: str = "rebalance",
) -> DataFrame:
    """Downsample groups so the surviving corpus MATCHES a target
    group distribution (the DoReMi/data-mixing move: "make web 60%,
    code 25%, books 15%" out of whatever the crawl produced) — by
    deletion only, never duplication, so no example repeats.

    Let ``n_g`` be actual group sizes and ``t_g`` the (normalized)
    targets. The largest corpus satisfying the targets exactly keeps
    ``T = min_g n_g / t_g`` total rows, i.e. ``keep_g = t_g · T`` per
    group — the group(s) attaining the min survive whole (the binding
    constraint), every other group thins by its deterministic hash
    variate (:func:`hash_variate` of ``key_col``: stable under reruns,
    partitioning, and corpus growth). Groups absent from ``targets``
    are dropped (target share 0). Zero-target or empty groups never
    divide by zero.

    The per-group keep FRACTION (not count, 6-digit-rounded so the
    DuckDB oracle reproduces the threshold digit-for-digit) is applied
    as a variate threshold, so survival is row-local: expected sizes
    hit the target with binomial-order error (~1/√n per group) — the
    price of not running a per-group exact-count pass; at
    training-corpus scale the deviation is negligible.

    Like :func:`temperature_mix`, the per-group counts are collected —
    |groups| rows, dimension-sized by contract (a group distribution a
    human writes targets for has at most thousands of entries); the
    corpus itself is scanned once for the counts and once for the
    row-local filter against the broadcast literal threshold map. A
    tiny self-joined-aggregate alternative exists but trips Spark's
    self-join column-resolution ambiguity; the collect is both safer
    and the established house style for |sources|-sized stats.
    """
    total_t = float(sum(targets.values()))
    if total_t <= 0:
        raise ValueError("rebalance_to_target: targets must sum > 0")
    norm = {k: v / total_t for k, v in targets.items()}
    counts = {
        r["_g"]: r["_n"]
        for r in df.groupBy(F.col(f"`{group_col}`").alias("_g"))
        .agg(F.count("*").alias("_n")).collect()
    }
    # filter BEFORE sorting: a NULL group in the data would otherwise hit
    # the None-vs-str comparison inside sorted() and raise TypeError
    targeted = sorted((g, n) for g, n in counts.items()
                      if g is not None and norm.get(g, 0.0) > 0 and n > 0)
    if not targeted:
        return df.filter(F.lit(False))
    cap = min(n / norm[g] for g, n in targeted)
    thr = {g: _threshold(round(min(1.0, norm[g] * cap / n), 6))
           for g, n in targeted}
    tmap = F.create_map(
        *[lit for g in sorted(thr) for lit in (F.lit(g), F.lit(thr[g]))])
    v = hash_variate(F.col(f"`{key_col}`"), seed)
    return df.filter(v < tmap[F.col(f"`{group_col}`")])


def budget_mix(
    df: DataFrame,
    budgets: Dict[str, float],
    group_col: str = "source",
    weight_col: str = "n_tokens",
    key_col: str = "doc_id",
    seed: str = "budget",
) -> DataFrame:
    """Thin each group to a target total WEIGHT — the production mixing
    knob is token (or byte) budgets per source, not document counts
    (\"200B tokens of web, 30B of code, ...\"), which
    :func:`rebalance_to_target`'s row-count fractions can't express when
    per-doc length differs across sources. Each group keeps the
    deterministic hash-variate fraction ``min(1, budget_g / weight_g)``
    of its documents, so the kept weight is the budget in expectation
    (exact-knapsack selection would need a per-group ordered scan;
    variate thinning is the growth-stable form — a row's fate never
    changes as the corpus grows, and re-runs are reproducible). Groups
    absent from ``budgets`` (and NULL groups) drop entirely, matching
    rebalance_to_target.

    One tiny aggregate (per-group weight sums, |groups| rows to the
    driver — the temperature_mix pattern), then a pure row-local filter
    against a broadcast group→threshold map: one corpus scan, zero
    shuffles.
    """
    if not budgets or any(b < 0 for b in budgets.values()):
        raise ValueError("budget_mix: budgets must be non-negative, non-empty")
    sums = {
        r["_g"]: r["_w"]
        for r in df.groupBy(F.col(f"`{group_col}`").alias("_g"))
        .agg(F.sum(F.col(f"`{weight_col}`")).alias("_w")).collect()
    }
    frac = {
        g: min(1.0, round(float(budgets[g]) / w, 6))
        for g, w in sums.items()
        if g is not None and g in budgets and w is not None and w > 0
           and budgets[g] > 0
    }
    if not frac:
        return df.filter(F.lit(False))
    thr = F.create_map(*[lit for g in sorted(frac)
                         for lit in (F.lit(g), F.lit(_threshold(frac[g])))])
    v = hash_variate(F.col(f"`{key_col}`"), seed)
    return df.filter(v < thr[F.col(f"`{group_col}`")])
