"""Window / sequential operators (SURVEY §2.6 W2-W5, §2.5 A4/A6).

The reference computes these with explicit Python loops over sorted rows
(``feldman.py:500-529``); here they are Spark window functions — fully
distributed, partitioned by the grouping key.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "lag_diff",
    "expanding_slope",
    "first_seen",
    "section_range",
    "explode_section_range",
    "scd2_intervals",
    "time_gapfill",
    "rolling_time_agg",
    "grouped_topk",
    "funnel_steps",
    "conversion_lag",
    "rolling_anomaly",
    "ewma_last",
    "event_transitions",
    "retention_cohorts",
    "merge_intervals",
    "grouped_mode",
    "resample_interpolate",
    "cusum_changepoint",
    "weighted_percentile",
    "locf_fill",
    "session_paths",
    "time_weighted_avg",
    "seasonal_autocorr",
]


def _cols(names: Sequence[str]) -> list:
    return [F.col(f"`{n}`") for n in names]


# fixed-length truncation units in seconds; calendar units (month,
# quarter, year) have no fixed length and are validated by unit-name
# match instead
_UNIT_SECONDS = {
    "second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800,
}


def _validate_gapfill_step(unit: str, step: str) -> None:
    """Reject a gap-fill ``step`` that cannot align with
    ``date_trunc(unit)`` buckets (see :func:`time_gapfill`)."""
    import re

    m = re.fullmatch(r"\s*(\d+)\s+([A-Za-z]+?)s?\s*", step)
    if not m:
        raise ValueError(
            f"time_gapfill: step {step!r} is not of the form '<n> <unit>'")
    n, step_unit = int(m.group(1)), m.group(2).lower()
    u = unit.lower()
    if n < 1:
        raise ValueError(f"time_gapfill: step {step!r} must be positive")
    if u in _UNIT_SECONDS and step_unit in _UNIT_SECONDS:
        step_s = n * _UNIT_SECONDS[step_unit]
        if step_s % _UNIT_SECONDS[u] != 0:
            raise ValueError(
                f"time_gapfill: step {step!r} is not a whole multiple of "
                f"unit {unit!r} — grid buckets would never match the "
                f"date_trunc({unit!r}) count keys")
    elif step_unit != u:
        # calendar units: only same-unit steps are alignment-safe
        raise ValueError(
            f"time_gapfill: calendar unit {unit!r} requires a step in the "
            f"same unit (got {step!r})")


def lag_diff(
    df: DataFrame,
    value: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    out: str = "diff",
) -> DataFrame:
    """W2: per-group differential — value minus previous row's value; the
    group's first row keeps its full value (``feldman.py:509-514``:
    ``diffOffset = cumOffset - prevOffset``, first row → ``cumOffset``)."""
    w = Window.partitionBy(*_cols(partition_by)).orderBy(*order_by)
    v = F.col(f"`{value}`")
    return df.withColumn(out, v - F.coalesce(F.lag(v).over(w), F.lit(0.0)))


def expanding_slope(
    df: DataFrame,
    x: str,
    y: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    out: str = "slope",
    digits: Optional[int] = 3,
) -> DataFrame:
    """W3/A6: expanding OLS slope of (x, y) over all rows so far within the
    group, rounded; first row and degenerate fits → 0.0
    (``feldman.py:516-527``, ``numpy.polyfit(...,1)[0]``).

    ``regr_slope`` over an expanding frame computes the identical
    least-squares slope JVM-side — no Python loop, no UDF.
    """
    w = (
        Window.partitionBy(*_cols(partition_by))
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    slope = F.regr_slope(F.col(f"`{y}`"), F.col(f"`{x}`")).over(w)
    if digits is not None:
        # python round() semantics (HALF_EVEN), matching feldman.py:520
        slope = F.bround(slope, digits)
    return df.withColumn(out, F.coalesce(slope, F.lit(0.0)))


def first_seen(
    df: DataFrame, partition_by: Sequence[str], order_by: Sequence[Column],
) -> DataFrame:
    """W4: keep the first-seen row per key (``feldman.py:236-248``:
    one affine row per core, repeats ignored)."""
    w = Window.partitionBy(*_cols(partition_by)).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def section_range(top_col: str, bot_col: str) -> Column:
    """W5: inclusive integer range topSection..botSection as an array of
    *strings* (sections are string-typed identity values,
    ``feldman.py:323-327``)."""
    top = F.col(f"`{top_col}`").cast("int")
    bot = F.col(f"`{bot_col}`").cast("int")
    return F.transform(F.sequence(top, bot), lambda s: s.cast("string"))


def explode_section_range(
    df: DataFrame, top_col: str, bot_col: str, out: str = "Section",
) -> DataFrame:
    """W5 applied: one row per section in the interval's section range."""
    return df.withColumn(out, F.explode(section_range(top_col, bot_col)))


def scd2_intervals(
    df: DataFrame,
    key: Sequence[str],
    ts_col: str,
    tiebreak: Optional[Sequence[str]] = None,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type-2 intervals from a change log: each
    record becomes a validity interval ``[ts, next-change ts)`` per key,
    with the latest record per key open-ended and flagged current — the
    standard warehouse historization of an append-only attribute feed
    (beyond-reference; the change-log shape training pipelines use for
    feature snapshots, paired with :func:`~feldman_spark.ops.joins.asof_join`
    for point-in-time reads).

    One window pass per key — a single shuffle on ``key``, state bounded
    per key-task; ``tiebreak`` columns (default none) make simultaneous
    changes deterministic.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    w = Window.partitionBy(*_cols(key)).orderBy(*order)
    nxt = F.lead(F.col(ts_col)).over(w)
    return (
        df.withColumn(from_col, F.col(ts_col))
        .withColumn(to_col, nxt)
        .withColumn(current_col, nxt.isNull())
        .drop(ts_col)
    )


def time_gapfill(
    df: DataFrame,
    ts_col: str,
    group_cols: Sequence[str],
    unit: str = "hour",
    step: str = "1 hour",
    count_col: str = "n",
) -> DataFrame:
    """Dense time-series resampling: truncate event time to ``unit``
    buckets, then LEFT-join the per-(bucket, group) counts onto the full
    bucket × group grid so silent periods appear as explicit zero rows —
    the gap-filling step dashboards and downsampled feature series need
    (a missing hour must read 0, not vanish).

    The grid is built from one min/max aggregate (a single row) exploded
    through ``sequence(lo, hi, step)`` and cross-joined with the
    distinct groups — grid size is (span/step) × |groups|, independent
    of event volume, so the cross join is dimension-sized by
    construction; the event table itself contributes one grouped
    aggregate (one shuffle) and the grid join broadcasts. That
    broadcast bounds span/step: a years-long span at a seconds-grain
    step makes the grid itself huge — keep (span/step) × |groups| under
    the broadcast threshold or coarsen ``step``.

    ``step`` must be a whole multiple of ``unit`` (validated): counts
    are keyed by ``date_trunc(unit)``, so a finer or misaligned step
    (e.g. ``unit='hour'``, ``step='30 minutes'``) would put half the
    grid buckets where no counts key can ever land — silently reporting
    0 for populated periods.
    """
    _validate_gapfill_step(unit, step)
    b = F.date_trunc(unit, F.col(ts_col))
    bounds = df.agg(F.min(b).alias("_lo"), F.max(b).alias("_hi"))
    grid = bounds.select(
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"),
                             F.expr(f"INTERVAL {step}"))).alias("bucket"))
    groups = df.select(*[F.col(c) for c in group_cols]).distinct()
    full = grid.crossJoin(F.broadcast(groups))
    counts = df.groupBy(b.alias("bucket"), *[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias(count_col))
    joined = full.join(F.broadcast(counts), ["bucket", *group_cols], "left")
    return joined.withColumn(
        count_col, F.coalesce(F.col(count_col), F.lit(0)).cast("bigint"))


def rolling_time_agg(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    span_seconds: int,
    digits: int = 4,
) -> DataFrame:
    """W8 (beyond reference): per-row rolling aggregates over a TIME
    range — for each row, the count / sum / mean of ``value_col`` across
    the key's rows with ``ts ∈ [ts - span_seconds, ts]``. The row-count
    windows of W2/W3 (``rowsBetween``) can't express this: rolling
    "last hour" must follow the clock, not the row index, and rows with
    EQUAL timestamps must see each other symmetrically (RANGE frames
    include all peers of the current ts in both engines, so the result
    is deterministic under any tie order).

    Adds ``rolling_n`` / ``rolling_sum`` / ``rolling_avg`` (sum and avg
    rounded to ``digits``).

    Scale (100 TB): one shuffle on the key, then a single sorted range
    scan per partition — Spark evaluates the RANGE frame with two
    monotone pointers over the sorted run, O(rows) amortized, state
    bounded by the span's row count. Keys are the bound on partition
    size (per-user event streams); a global rolling aggregate with no
    key would serialize and should use windowed groupBy instead.
    """
    # order by MICROSECOND-precision epoch, not cast('long'): second
    # truncation would move sub-second timestamps across the frame edge
    # relative to true interval arithmetic. timestampdiff against a fixed
    # epoch literal is timezone-free and accepts TIMESTAMP and
    # TIMESTAMP_NTZ alike (unix_micros rejects NTZ).
    dt = dict(df.dtypes).get(ts_col, "timestamp")
    lit_kw = "TIMESTAMP_NTZ" if dt == "timestamp_ntz" else "TIMESTAMP"
    micros = F.expr(
        f"timestampdiff(MICROSECOND, {lit_kw} '1970-01-01 00:00:00', "
        f"`{ts_col}`)")
    w = (
        Window.partitionBy(*_cols(keys))
        .orderBy(micros)
        .rangeBetween(-int(span_seconds) * 1_000_000, 0)
    )
    v = F.col(value_col)
    return (
        df.withColumn("rolling_n", F.count(F.lit(1)).over(w).cast("bigint"))
        .withColumn("rolling_sum", F.bround(F.sum(v).over(w), digits))
        .withColumn("rolling_avg", F.bround(F.avg(v).over(w), digits))
    )


def grouped_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    tiebreak_cols: Sequence[str] = (),
    descending: bool = True,
    partial: bool = True,
) -> DataFrame:
    """EXACT top-``k`` rows per group by ``order_col`` (beyond reference —
    "best k documents per language/domain" over a corpus).

    The textbook ``row_number`` window shuffles EVERY row to its group's
    reducer and sorts the whole group — at corpus scale a hot group
    (one language with billions of docs) serializes on one task. Here a
    per-partition pre-reduction (``mapInPandas``, state bounded by
    groups-in-partition × k) keeps each partition's local top-k per
    group first: any row in the global top-k is necessarily in its
    partition's local top-k, so the window then runs over at most
    k × num_partitions rows per group — the shuffle carries candidates,
    not the corpus, and hot groups stay parallel until the final
    (tiny) ranking. Set ``partial=False`` to get the plain window form
    (the oracle twin).

    Rows with a NULL ``order_col`` are excluded (top-k of a metric).
    Ties on ``order_col`` break by ``tiebreak_cols`` ascending — pass a
    unique key there for a fully deterministic result; with no tiebreak
    and duplicate order values the kept rows are arbitrary.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    gks = list(group_cols)
    tbs = list(tiebreak_cols)
    src = df.filter(F.col(order_col).isNotNull())

    order_exprs = (
        [F.col(order_col).desc() if descending else F.col(order_col).asc()]
        + [F.col(c).asc() for c in tbs]
    )

    pre = src
    if partial:
        schema = src.schema
        sort_cols = [order_col] + tbs
        sort_asc = [not descending] + [True] * len(tbs)

        def local_topk(batches):
            import pandas as pd

            acc = None
            for pdf in batches:
                cur = pdf if acc is None else pd.concat((acc, pdf))
                cur = cur.sort_values(sort_cols, ascending=sort_asc,
                                      kind="stable")
                acc = cur.groupby(gks, sort=False, dropna=False).head(k)
            if acc is not None:
                yield acc

        pre = src.mapInPandas(local_topk, schema=schema)

    w = Window.partitionBy(*_cols(gks)).orderBy(*order_exprs)
    return (
        pre.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    steps: Sequence[tuple],
) -> DataFrame:
    """Ordered-funnel analysis (beyond reference — product-analytics
    staple): for each user, step ``i`` is reached at the earliest event
    satisfying its predicate AT OR AFTER the time step ``i-1`` was
    reached (step 0 unconditionally first). Returns one row per step:
    ``(step_idx, step, users, conv_rate)`` where ``conv_rate`` is the
    fraction of step-0 reachers who got this far (rounded to 4).

    ``steps`` is a sequence of ``(name, predicate_column)`` pairs.

    Scale shape: ONE shuffle — every step's time is an unordered
    ``min(when(...))`` window aggregate over the same
    ``partitionBy(user)`` spec, so Catalyst plans a single exchange and
    evaluates the k window passes in memory (no sort: the frames are
    whole-partition). The per-user collapse that follows reuses the
    same partitioning (no second exchange), and the final step counts
    are one tiny aggregate. No event text/props move; a hot user is
    bounded by that user's event count, not the corpus.
    """
    if not steps:
        raise ValueError("funnel_steps: need at least one step")
    w = Window.partitionBy(F.col(f"`{user_col}`"))
    cur = df
    prev = None
    for i, (_, pred) in enumerate(steps):
        cond = pred if prev is None else (
            pred & prev.isNotNull() & (F.col(f"`{ts_col}`") >= prev))
        cur = cur.withColumn(
            f"_t{i}", F.min(F.when(cond, F.col(f"`{ts_col}`"))).over(w))
        prev = F.col(f"_t{i}")
    per_user = cur.groupBy(user_col).agg(
        *[F.max(f"_t{i}").alias(f"_t{i}") for i in range(len(steps))])
    counts = per_user.agg(
        *[F.count(f"_t{i}").alias(f"_n{i}") for i in range(len(steps))])
    # one row per step via explode of a literal struct array — a UNION of
    # per-step selects would re-evaluate the whole funnel per branch
    entries = [
        F.struct(
            F.lit(i).alias("step_idx"),
            F.lit(name).alias("step"),
            F.col(f"_n{i}").cast("bigint").alias("users"),
            F.round(
                F.col(f"_n{i}") / F.when(F.col("_n0") > 0, F.col("_n0")), 4
            ).alias("conv_rate"),
        )
        for i, (name, _) in enumerate(steps)
    ]
    return counts.select(F.explode(F.array(*entries)).alias("_s")).select(
        "_s.*")


def conversion_lag(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    from_pred: Column,
    to_pred: Column,
    quantiles: Sequence[float] = (0.5, 0.9),
    digits: int = 4,
) -> DataFrame:
    """Time-to-convert distribution between two funnel steps: per user,
    the earliest event matching ``from_pred`` and the earliest event
    matching ``to_pred`` at-or-after it; returns ONE summary row
    ``(n_start, n_converted, conv_rate, avg_lag_s, p<q>_lag_s...)``
    with lags in whole seconds and exact percentiles.

    Same single-exchange shape as :func:`funnel_steps`: both step times
    are unordered ``min(when(...))`` windows over one
    ``partitionBy(user)`` spec, the per-user collapse reuses that
    partitioning, and the summary is one tiny aggregate (exact
    ``percentile`` over the per-user lag column — one value per
    converting user, not per event). Swap in ``approx_percentile`` when
    even per-user rows are too many to buffer on one aggregator.
    """
    if not quantiles:
        raise ValueError("conversion_lag: need at least one quantile")
    if any(q < 0 or q > 1 for q in quantiles):
        raise ValueError(f"conversion_lag: quantiles must be in [0,1] "
                         f"(got {list(quantiles)})")
    ts = F.col(f"`{ts_col}`")
    w = Window.partitionBy(F.col(f"`{user_col}`"))
    cur = df.withColumn("_from", F.min(F.when(from_pred, ts)).over(w))
    cur = cur.withColumn(
        "_to",
        F.min(F.when(
            to_pred & F.col("_from").isNotNull() & (ts >= F.col("_from")),
            ts)).over(w))
    per_user = cur.groupBy(user_col).agg(
        F.max("_from").alias("_from"), F.max("_to").alias("_to"))
    # whole-second lag via second-truncated timestampdiff: NTZ-safe
    # (TIMESTAMP_NTZ cannot cast to BIGINT) and identical to the
    # boundary-crossing floor(epoch(to)) - floor(epoch(from)) a DuckDB
    # date_diff('second', ...) twin computes
    lag = F.expr("timestampdiff(SECOND, date_trunc('second', _from), "
                 "date_trunc('second', _to))")
    qarr = ", ".join(str(q) for q in quantiles)
    out = per_user.select(F.col("_from"), lag.alias("_lag")).agg(
        F.count("_from").cast("bigint").alias("n_start"),
        F.count("_lag").cast("bigint").alias("n_converted"),
        F.expr(f"percentile(_lag, array({qarr}))").alias("_q"),
        F.avg("_lag").alias("_avg"),
    )
    qcols = [
        F.round(F.element_at("_q", i + 1), digits)
        .alias(f"p{int(q * 100):02d}_lag_s")
        for i, q in enumerate(quantiles)
    ]
    return out.select(
        "n_start", "n_converted",
        F.round(F.col("n_converted")
                / F.when(F.col("n_start") > 0, F.col("n_start")), 6)
        .alias("conv_rate"),
        F.round("_avg", digits).alias("avg_lag_s"),
        *qcols,
    )


def rolling_anomaly(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    bucket: str = "hour",
    lookback: int = 24,
    z_thresh: float = 3.0,
    min_periods: int = 3,
    digits: int = 6,
) -> DataFrame:
    """Volume-spike detection per key: bucket events by
    ``date_trunc(bucket, ts)``, score every bucket's count against the
    mean/stddev of its own trailing ``lookback`` buckets (frame
    ``ROWS BETWEEN lookback PRECEDING AND 1 PRECEDING`` — the current
    bucket never contaminates its own baseline), and flag
    ``z > z_thresh``. Returns one row per (key, bucket):
    ``(*key_cols, bucket, n, z, is_anomaly)``; ``z`` is null until
    ``min_periods`` history buckets exist or while the baseline stddev
    is 0 (flat history — any change would be infinite z; callers who
    want "flat then jumped" use ``n > _mean`` directly).

    Scale shape: the bucketing aggregate collapses events map-side to
    one slim count row per (key, bucket) — the only corpus-sized
    exchange. The window sort then runs over bucket rows (hours, not
    events): days×24 rows per key, trivially in-memory; no event text
    moves.
    """
    if lookback < 1:
        raise ValueError(f"rolling_anomaly: lookback must be >= 1 "
                         f"(got {lookback})")
    keys = _cols(key_cols)
    b = df.groupBy(
        *keys, F.date_trunc(bucket, F.col(f"`{ts_col}`")).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (Window.partitionBy(*keys).orderBy("bucket")
         .rowsBetween(-lookback, -1))
    scored = b.select(
        *keys, F.col("bucket"), F.col("n"),
        F.avg("n").over(w).alias("_mean"),
        F.stddev_samp("n").over(w).alias("_sd"),
        F.count("n").over(w).alias("_hist"),
    )
    z = F.when(
        (F.col("_hist") >= min_periods) & (F.col("_sd") > 0),
        F.round((F.col("n") - F.col("_mean")) / F.col("_sd"), digits))
    return scored.select(
        *keys, "bucket", F.col("n").cast("bigint").alias("n"),
        z.alias("z"),
        F.coalesce(z > z_thresh, F.lit(False)).alias("is_anomaly"),
    )


def ewma_last(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.3,
    digits: int = 6,
) -> DataFrame:
    """Exponentially-weighted moving average per key, returning the
    final smoothed value after folding the key's events in
    ``order_cols`` order: ``ewma_i = alpha*x_i + (1-alpha)*ewma_{i-1}``,
    seeded with the first value. Returns ``(*key_cols, n_events,
    ewma)``.

    EWMA is inherently order-sequential (each output depends on the
    previous), so the sanctioned shape is a per-key array fold — the
    same contract as the BPE merge fold (`text.py::bpe_apply_merges`):
    ``sort_array(collect_list(...))`` bounds memory by the LARGEST
    SINGLE KEY's event count (keys are independent and parallel; the
    corpus never concentrates on one aggregator). The ``aggregate`` HOF
    is CodegenFallback, but it runs on one row per key, not per event.
    For bucketed trend smoothing at corpus scale, pre-aggregate to
    time buckets first (cf. :func:`rolling_anomaly`) so the folded
    arrays are days long, not event-count long.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"ewma_last: alpha must be in (0, 1] "
                         f"(got {alpha})")
    arr = F.sort_array(F.collect_list(F.struct(
        *[F.col(f"`{c}`") for c in order_cols],
        F.col(f"`{value_col}`").cast("double").alias("_v"))))
    vals = F.transform(arr, lambda s: s["_v"])
    ew = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )
    return df.groupBy(*_cols(key_cols)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(ew, digits).alias("ewma"),
    )


def event_transitions(
    df: DataFrame,
    key_col: str,
    state_col: str,
    order_cols: Sequence[str],
    digits: int = 6,
) -> DataFrame:
    """First-order Markov transition counts over per-key ordered event
    streams: ``(prev_state, state, n, prob)`` where ``prob`` is the
    row-normalized transition probability out of ``prev_state``
    (rounded to ``digits``) — the session-model behind next-action
    prediction, funnel diagnosis, and bot detection (a scraper's
    transition matrix is nearly deterministic; a human's is not).

    ``order_cols`` must define a TOTAL order within each key (pass a
    unique id as the last column) — ties would otherwise make ``lag``
    nondeterministic. Each key's first event has no predecessor and is
    excluded.

    Scale (100 TB): one exchange — the ``lag`` window partitions by
    key and sort-orders locally; the (prev, state) pair counts that
    follow partial-aggregate map-side into a state²-sized table, and
    the row normalization joins against a states-sized aggregate.
    Event payloads never move: only the key/state/order columns enter
    the window.
    """
    ocols = [F.col(f"`{c}`") for c in order_cols]
    w = Window.partitionBy(F.col(f"`{key_col}`")).orderBy(*ocols)
    pairs = (
        df.select(
            F.col(f"`{key_col}`"),
            F.col(f"`{state_col}`").alias("state"),
            *ocols,
        )
        .withColumn("prev_state", F.lag("state").over(w))
        .filter(F.col("prev_state").isNotNull())
    )
    counts = pairs.groupBy("prev_state", "state").agg(
        F.count("*").alias("n"))
    outdeg = counts.groupBy("prev_state").agg(F.sum("n").alias("_tot"))
    return (
        counts.join(F.broadcast(outdeg), "prev_state")
        .select(
            "prev_state", "state", "n",
            F.round(F.col("n") / F.col("_tot"), digits).alias("prob"),
        )
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    unit: str = "week",
    digits: int = 6,
) -> DataFrame:
    """Cohort retention analysis: users are cohorted by the period of
    their FIRST event; each later period they are active again counts
    toward that cohort's retention. Returns one row per (cohort,
    offset): ``(cohort, offset, active_users, retention)`` where
    ``offset`` counts periods since the cohort period (0 = the cohort
    period itself, retention 1.0 by construction) and ``retention =
    active_users / cohort_size`` rounded to ``digits``.

    ``unit`` is any ``date_trunc`` unit whose buckets are uniform in
    days (``week``/``day``); offsets divide the day difference by the
    period length, exact because both ends are truncated.

    Scale (100 TB of events): the stream first collapses to DISTINCT
    (user, period) — one user-keyed shuffle with map-side combine; the
    per-user first period is an aggregate over that same reduced table
    (reusing the user partitioning, no second fact exchange), joined
    back user-to-user (co-partitioned). The final (cohort, offset)
    aggregate is calendar-sized. Event payloads never move.
    """
    days = {"day": 1, "week": 7}.get(unit)
    if days is None:
        raise ValueError(
            f"retention_cohorts: unit must be day|week, got {unit!r}")
    u = F.col(f"`{user_col}`")
    period = F.date_trunc(unit, F.col(f"`{ts_col}`")).cast("date")
    active = (
        df.select(u.alias("_u"), period.alias("_p"))
        .filter(F.col("_u").isNotNull() & F.col("_p").isNotNull())
        .distinct()
    )
    cohorts = active.groupBy("_u").agg(F.min("_p").alias("cohort"))
    sizes = cohorts.groupBy("cohort").agg(
        F.count("*").alias("_cohort_size"))
    return (
        active.join(cohorts, "_u")
        .select(
            "_u", "cohort",
            (F.datediff(F.col("_p"), F.col("cohort")) / F.lit(days))
            .cast("bigint").alias("offset"),
        )
        .groupBy("cohort", "offset")
        .agg(F.count("*").alias("active_users"))
        .join(F.broadcast(sizes), "cohort")
        .select(
            "cohort", "offset", "active_users",
            F.round(F.col("active_users") / F.col("_cohort_size"),
                    digits).alias("retention"),
        )
    )


def merge_intervals(
    df: DataFrame,
    group_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Gaps-and-islands interval coalescing (beyond reference — the
    classic "merge overlapping [start, end] spans per key" operator:
    engagement periods from per-event attention windows, machine
    busy-time from job spans, SCD validity stitching). Two intervals in
    a group merge when they overlap OR touch (``start <= running max
    end`` — closed intervals). Returns one row per merged island:
    the group columns, ``island_start`` (min start), ``island_end``
    (max end) and ``n_merged`` (source-interval count), plus
    ``island`` (the 1-based per-group island ordinal, a stable key
    for downstream joins). Rows with a NULL start or end are dropped
    (an unbounded interval has no merge semantics here).

    Plan shape: ONE shuffle on the group key; the running
    ``max(end)`` over rows-preceding and the island counter are a
    single window pass over each group sorted by (start, end), then a
    partial-aggregated groupBy on (group, island). Per-group work is
    the window sort — hot keys serialize on one task, which for this
    operator is inherent (islands are a sequential scan per group);
    at 100 TB the group key (user, machine, document) is the natural
    partitioner and cardinality is high.
    """
    gks = _cols(list(group_cols))
    s, e = F.col(start_col), F.col(end_col)
    src = df.filter(s.isNotNull() & e.isNotNull())
    w_prev = (Window.partitionBy(*gks).orderBy(s.asc(), e.asc())
              .rowsBetween(Window.unboundedPreceding, -1))
    w_run = (Window.partitionBy(*gks).orderBy(s.asc(), e.asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    new_island = F.when(s > F.max(e).over(w_prev), 1).otherwise(0)
    # the first row of each group has a NULL preceding max -> WHEN is
    # false -> 0; sum() starts islands at 0, so +1 for a 1-based ordinal
    island = (F.sum(new_island).over(w_run) + 1).alias("island")
    return (
        src.select(*gks, s.alias("_s"), e.alias("_e"), island)
        .groupBy(*[F.col(c) for c in group_cols], F.col("island"))
        .agg(F.min("_s").alias("island_start"),
             F.max("_e").alias("island_end"),
             F.count("*").alias("n_merged"))
    )


def grouped_mode(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "mode",
) -> DataFrame:
    """Most frequent value per group with a deterministic tie-break
    (beyond reference — "dominant action per user", "modal shipmode
    per region"). Returns the group columns, ``out_col`` (the modal
    value) and ``mode_count``. Ties break to the SMALLEST value so the
    result is unique; NULL values are excluded (the mode of observed
    values).

    Plan shape: ONE pass over the fact table — the heavy aggregation is
    ``groupBy(group, value)``, which partial-aggregates map-side so the
    shuffle carries distinct (group, value) pairs, not rows. The argmax
    is a row_number window over those slim pair counts (count desc,
    value asc). The join-back alternative (per-group max count joined
    against the pairs) re-scans the fact table because the pair subplan
    isn't reused across the two consumers; the window re-shuffles only
    pair rows, and a hot group costs its distinct-value count, not its
    row count. The tie-break via ordering stays portable across value
    types, where a struct-max trick would need a type-specific order
    inversion.
    """
    gks = [F.col(c) for c in group_cols]
    v = F.col(value_col)
    pairs = (df.filter(v.isNotNull())
             .groupBy(*gks, v.alias("_v"))
             .agg(F.count("*").alias("_n")))
    w = (Window.partitionBy(*[F.col(c) for c in group_cols])
         .orderBy(F.col("_n").desc(), F.col("_v").asc()))
    return (
        pairs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(*[F.col(c) for c in group_cols],
                F.col("_v").alias(out_col),
                F.col("_n").alias("mode_count"))
    )


def resample_interpolate(
    df: DataFrame,
    partition_by: Sequence[str],
    x_col: str,
    y_col: str,
    step: int,
    out_x: str = "grid_x",
    out_y: str = "y_interp",
    digits: int = 4,
) -> DataFrame:
    """W11 (beyond reference): per-group uniform-grid resampling with
    LINEAR INTERPOLATION — the signal-alignment primitive behind
    comparing irregularly-sampled series (sensor feeds, depth-measured
    core logs, per-user activity values) on a common grid. For every
    group, emits one row per grid point ``k*step`` inside the group's
    observed ``[min(x), max(x)]`` span, with ``y`` linearly
    interpolated between the bracketing samples (exact sample values
    where a sample lands on the grid). Distinct from
    :func:`time_gapfill`, which densifies COUNT buckets with zeros;
    this reconstructs a continuous VALUE between observations.

    ``x_col`` must be integral (epoch micros/seconds, depth in
    micrometres): the grid bounds use integer ceil/floor division so
    the grid is bit-exact cross-engine, and the interpolation weight
    ``(x-x0)/(x1-x0)`` divides exact integers. Duplicate samples at one
    ``x`` collapse to their mean first (the resample contract).

    Plan shape: samples collapse to distinct (group, x) via one
    partial-aggregating pass; grid bounds are a group-sized aggregate
    whose rows explode into the grid (output-sized, never corpus-
    sized); samples and grid union into ONE window sort per group where
    two frames of the same sort (last-sample-before via unbounded-
    preceding, first-sample-after via unbounded-following) bracket
    every grid point — no as-of join, no range join, one exchange
    feeding one sort. A group's cost is its sample count plus its grid
    length, so skew follows the data's own span, and the whole plan
    survives 100 TB because nothing global ever materializes.
    """
    if int(step) <= 0:
        raise ValueError(f"resample_interpolate: step must be positive, "
                         f"got {step}")
    step = int(step)
    keys = [F.col(f"`{c}`") for c in partition_by]
    xc, yc = F.col(f"`{x_col}`"), F.col(f"`{y_col}`")
    samples = (
        df.filter(xc.isNotNull() & yc.isNotNull())
        .groupBy(*keys, xc.cast("long").alias("_x"))
        .agg(F.avg(yc).alias("_y"))
    )
    bounds = samples.groupBy(*[F.col(c) for c in partition_by]).agg(
        F.min("_x").alias("_lo"), F.max("_x").alias("_hi"))
    # integer ceil/floor division: bit-exact grid cross-engine
    k0 = F.expr(f"(_lo + {step - 1}) div {step}")
    k1 = F.expr(f"_hi div {step}")
    grid = (
        bounds.filter(k1 >= k0)
        .select(*[F.col(c) for c in partition_by],
                F.explode(F.sequence(k0, k1)).alias("_k"))
        .select(*[F.col(c) for c in partition_by],
                (F.col("_k") * F.lit(step).cast("long")).alias("_x"))
    )
    u = samples.select(*[F.col(c) for c in partition_by], "_x", "_y",
                       F.lit(1).alias("_is_s")).unionByName(
        grid.select(*[F.col(c) for c in partition_by], "_x",
                    F.lit(None).cast("double").alias("_y"),
                    F.lit(0).alias("_is_s")))
    # one sort: sample rows order BEFORE a grid row at the same x, so a
    # grid point hitting a sample exactly sees it as its "previous"
    w = (Window.partitionBy(*[F.col(c) for c in partition_by])
         .orderBy(F.col("_x").asc(), F.col("_is_s").desc()))
    wb = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    sx = F.when(F.col("_is_s") == 1, F.col("_x"))
    sy = F.when(F.col("_is_s") == 1, F.col("_y"))
    br = u.select(
        *[F.col(c) for c in partition_by], "_x", "_is_s",
        F.last(sx, ignorenulls=True).over(wb).alias("_px"),
        F.last(sy, ignorenulls=True).over(wb).alias("_py"),
        F.first(sx, ignorenulls=True).over(wf).alias("_nx"),
        F.first(sy, ignorenulls=True).over(wf).alias("_ny"),
    ).filter((F.col("_is_s") == 0)
             & F.col("_px").isNotNull()
             # a grid point landing ON the last sample has no "next"
             # bracket and needs none — its value IS the sample's
             & (F.col("_nx").isNotNull() | (F.col("_x") == F.col("_px"))))
    t = ((F.col("_x") - F.col("_px")).cast("double")
         / (F.col("_nx") - F.col("_px")).cast("double"))
    yv = F.when(F.col("_x") == F.col("_px"), F.col("_py")).otherwise(
        F.col("_py") + (F.col("_ny") - F.col("_py")) * t)
    return br.select(*[F.col(c) for c in partition_by],
                     F.col("_x").alias(out_x),
                     F.bround(yv, digits).alias(out_y))


def cusum_changepoint(
    df: DataFrame,
    partition_by: Sequence[str],
    value_col: str,
    order_by: Sequence[str],
    min_points: int = 8,
    digits: int = 4,
) -> DataFrame:
    """Beyond reference: CUSUM mean-shift changepoint detection — for
    each group, the point where the cumulative sum of deviations from
    the group mean peaks in magnitude, i.e. the single most likely
    location of a level shift (Page 1954). The monitoring question
    :func:`rolling_anomaly` does NOT answer: not "which bucket is
    locally weird" but "where did this series' regime change".

    Output: one row per group — ``n_points``, the ``order_by`` columns
    of the peak row (``cp_*``), ``cusum_peak`` = max|S_i| normalized by
    ``stddev_samp * sqrt(n)`` (the scale-free statistic whose large
    values indicate a real shift; ~< 1 is noise), and ``direction``
    (+1 = the series steps UP after the changepoint, -1 = down: S
    dips to a minimum before an upward step). Groups with fewer than
    ``min_points`` rows or zero deviation are dropped — a changepoint
    of a flat or tiny series is noise. Ties on |S| break to the
    earliest ``order_by`` position, so the result is deterministic.

    Plan shape: ONE exchange on the group key feeds everything — the
    unordered frame (mean/stddev/count) and the ordered cumulative sum
    share it, and the argmax is a row_number over the same partition.
    The running sum is evaluated sequentially over one sort on both
    engines, so the fold order — and hence the peak choice — is
    bit-identical cross-engine (the ewma_last precedent). Normalizing
    AFTER the argmax by the group-constant sd·sqrt(n) cannot reorder
    peaks within a group.
    """
    if min_points < 2:
        raise ValueError(
            f"cusum_changepoint: min_points must be >= 2, got {min_points}")
    keys = [F.col(f"`{c}`") for c in partition_by]
    ords = [F.col(f"`{c}`") for c in order_by]
    v = F.col(f"`{value_col}`")
    wp = Window.partitionBy(*keys)
    base = (df.filter(v.isNotNull())
            .select(*keys, *ords, v.alias("_v"))
            .withColumn("_mean", F.avg("_v").over(wp))
            .withColumn("_sd", F.stddev_samp("_v").over(wp))
            .withColumn("_n", F.count("*").over(wp)))
    wo = (Window.partitionBy(*keys)
          .orderBy(*[c.asc() for c in ords])
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    s = base.withColumn("_s", F.sum(F.col("_v") - F.col("_mean")).over(wo))
    wr = (Window.partitionBy(*keys)
          .orderBy(F.abs(F.col("_s")).desc(), *[c.asc() for c in ords]))
    peak = (s.filter((F.col("_n") >= min_points) & (F.col("_sd") > 0))
            .withColumn("_rk", F.row_number().over(wr))
            .filter(F.col("_rk") == 1))
    return peak.select(
        *[F.col(c) for c in partition_by],
        F.col("_n").alias("n_points"),
        *[F.col(f"`{c}`").alias(f"cp_{c}") for c in order_by],
        F.bround(F.abs(F.col("_s"))
                 / (F.col("_sd") * F.sqrt(F.col("_n").cast("double"))),
                 digits).alias("cusum_peak"),
        F.when(F.col("_s") < 0, F.lit(1)).otherwise(F.lit(-1))
        .alias("direction"),
    )


def weighted_percentile(
    df: DataFrame,
    partition_by: Sequence[str],
    value_col: str,
    weight_col: str,
    p: float = 0.5,
    out: str = "wpct",
    mode: str = "auto",
) -> DataFrame:
    """A14 (beyond reference): exact weighted percentile per group —
    the smallest value whose cumulative weight reaches ``p`` of the
    group's total weight (inverse-CDF / lower weighted quantile). The
    corpus-statistics form where rows are NOT equal: median document
    length weighted by token count, median price weighted by quantity —
    an unweighted median over-represents tiny rows.

    Output: one row per group with the group keys and ``out``. Rows
    with NULL or non-positive weight are excluded (they carry no mass).

    Deterministic by construction: equal values are interchangeable —
    whichever duplicate's running weight crosses the threshold, the
    selected VALUE is the same — so intra-tie ordering cannot change
    the answer.

    Plan shape (exact two-phase binned quantile): a group-keyed window
    sort of the WHOLE table would funnel every group's rows through one
    task — with analytics-grade group counts (3 return flags) that is
    the guide-§2.5 skew case, 2M-row single-task sorts at sf1 and worse
    at scale. Instead: (1) one parallel hash-aggregate computes each
    group's min/max/total mass; (2) one parallel hash-aggregate builds
    a ``num_bins``-bin weight histogram per group, and a window over
    the TINY (groups × bins) table finds the threshold bin plus the
    exact mass below it; (3) only the rows of the threshold bin —
    ~1/num_bins of the group — pay the value-ordered running-sum pick,
    offset by that carried-in mass. Three parallel column-pruned scans
    replace one serialized giant sort; the per-group stats broadcast
    (sized for low-cardinality analytic groups — the skew regime this
    form exists for).

    Exactness: identical to the single-sort form whenever weight sums
    are exact in double (integer-valued weights up to 2⁵³ — the A14
    quantity case); with arbitrary fractional weights the bin-partial
    summation order can differ by final-ulp rounding at a threshold
    boundary, the same caveat any parallel sum carries.

    ``mode="auto"`` (default) picks the plan from Catalyst's own size
    estimate of the input (optimizer plan statistics — metadata, no
    job): below ~64 MB the whole table sorts in seconds and the
    single-sort single-scan form wins (measured 1.27 vs 1.79 s at
    sf0.1); above it the skewed sort dominates and the binned form
    wins (7.22 vs 2.61 s at sf1, widening with scale). ``"sort"`` /
    ``"binned"`` force a path.
    """
    if not (0.0 < p < 1.0):
        raise ValueError(f"weighted_percentile: need 0 < p < 1, got {p}")
    num_bins = 4096
    keys = [f"`{c}`" for c in partition_by]
    kc = [F.col(c) for c in keys]
    out_keys = [F.col(c) for c in partition_by]
    v, wgt = F.col(f"`{value_col}`"), F.col(f"`{weight_col}`")
    rows = (df.filter(v.isNotNull() & wgt.isNotNull() & (wgt > 0))
            .select(*kc, v.alias("_v"), wgt.cast("double").alias("_w")))

    if mode == "auto":
        from feldman_spark.ops.sizing import plan_size_estimate

        mode = "binned" if plan_size_estimate(df) > (64 << 20) else "sort"
    if mode == "sort":
        wp = Window.partitionBy(*kc)
        wo = (Window.partitionBy(*kc).orderBy(F.col("_v").asc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        srows = (rows.withColumn("_tot", F.sum("_w").over(wp))
                 .withColumn("_cum", F.sum("_w").over(wo)))
        return (srows
                .filter(F.col("_cum") >= F.lit(float(p)) * F.col("_tot"))
                .groupBy(*out_keys)
                .agg(F.min("_v").alias(out)))
    if mode != "binned":
        raise ValueError(
            f"weighted_percentile: unknown mode {mode!r} "
            "(expected 'auto', 'sort' or 'binned')")

    # (1) per-group bounds + total mass (map-side partial aggregate)
    stats = rows.groupBy(*out_keys).agg(
        F.min("_v").alias("_lo"), F.max("_v").alias("_hi"),
        F.sum("_w").alias("_tot"))

    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(num_bins))
    bin_ = F.when(
        F.col("_hi") > F.col("_lo"),
        F.least(F.floor((F.col("_v") - F.col("_lo")) / width),
                F.lit(num_bins - 1)).cast("int"),
    ).otherwise(F.lit(0))
    binned = (rows.join(F.broadcast(stats), list(partition_by))
              .withColumn("_b", bin_))

    # (2) per-(group, bin) histogram; the threshold bin and the exact
    # mass below it come from a window over groups × num_bins rows
    hist = binned.groupBy(*out_keys, F.col("_b")).agg(
        F.sum("_w").alias("_bw"), F.first("_tot").alias("_tot"))
    wo_bins = (Window.partitionBy(*kc).orderBy(F.col("_b").asc())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    thr = F.lit(float(p)) * F.col("_tot")
    pick = (hist.withColumn("_cum", F.sum("_bw").over(wo_bins))
            .filter(F.col("_cum") >= thr)
            .groupBy(*out_keys)
            .agg(F.min(F.struct(
                F.col("_b").alias("_jb"),
                (F.col("_cum") - F.col("_bw")).alias("_below"))).alias("_s"))
            .select(*out_keys, F.col("_s._jb").alias("_jb"),
                    F.col("_s._below").alias("_below")))

    # (3) exact inverse-CDF pick inside the threshold bin only; the
    # carried-in mass offsets the running sum so qualification matches
    # the whole-group cumulative exactly
    tb = (binned.join(F.broadcast(pick), list(partition_by))
          .filter(F.col("_b") == F.col("_jb")))
    wo_v = (Window.partitionBy(*kc).orderBy(F.col("_v").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (tb.withColumn("_cum", F.sum("_w").over(wo_v) + F.col("_below"))
            .filter(F.col("_cum") >= thr)
            .groupBy(*out_keys)
            .agg(F.min("_v").alias(out)))


def locf_fill(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    value_cols: Sequence[str],
    backfill: bool = False,
    suffix: str = "_filled",
) -> DataFrame:
    """W12 (beyond reference): last-observation-carried-forward fill —
    per group, each NULL in ``value_cols`` takes the most recent non-null
    value in ``order_by`` order (the standard repair for sparse sensor
    feeds, slowly-changing attributes logged only on change, and
    gappy per-entity metrics). With ``backfill=True`` the leading
    NULLs (before any observation) additionally take the FIRST
    observation — otherwise they stay NULL, which is the honest
    default (no past to carry).

    Adds ``<col><suffix>`` per value column; never drops or reorders
    rows. Distinct from :func:`resample_interpolate` (which emits a new
    grid and interpolates BETWEEN observations): LOCF keeps the
    original rows and steps, it does not slope.

    Plan shape: ONE exchange on the group key, one sort; forward and
    (optional) backward fill are two frames of the SAME sort, so
    backfill costs no extra exchange. 100 TB: a group's cost is its own
    sort — the null repair never looks across groups.
    """
    keys = [F.col(f"`{c}`") for c in partition_by]
    ords = [F.col(f"`{c}`").asc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*ords)
    wb = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    out = df
    for c in value_cols:
        filled = F.last(F.col(f"`{c}`"), ignorenulls=True).over(wb)
        if backfill:
            filled = F.coalesce(
                filled, F.first(F.col(f"`{c}`"), ignorenulls=True).over(wf))
        out = out.withColumn(f"{c}{suffix}", filled)
    return out


def session_paths(
    df: DataFrame,
    session_cols: Sequence[str],
    step_col: str,
    order_by: Sequence[str],
    top_k: int = 20,
    sep: str = ">",
    max_steps: Optional[int] = None,
) -> DataFrame:
    """Top-``k`` ordered step sequences ("paths") across sessions —
    the product-analytics staple ("what do users actually DO, in
    order?") that :func:`event_transitions`' first-order matrix cannot
    answer: a Markov matrix forgets everything before the previous
    step, a path is the whole walk. Output: ``path`` (steps joined by
    ``sep``), ``n_sessions``, ordered by count desc with a
    deterministic path-asc tie-break, limited to ``top_k``.

    ``max_steps`` truncates each session's path to its first N steps —
    both a hot-session bound (one pathological crawler session can't
    build a megabyte path string) and the usual analysis choice
    (entry paths).

    Plan shape: one exchange on the session key builds each session's
    ordered step array (``array_sort`` over collected
    ``(order, step)`` structs — a per-session sort, NOT a window sort
    of the whole fact table); path counts partial-aggregate map-side,
    and the top-k is TakeOrdered (never a global sort). A session's
    cost is its own event count; the count table's cardinality is the
    number of DISTINCT paths, which ``max_steps`` caps geometrically.
    """
    if top_k < 1:
        raise ValueError(f"session_paths: top_k must be >= 1, got {top_k}")
    keys = [F.col(f"`{c}`") for c in session_cols]
    step = F.col(f"`{step_col}`")
    ordc = [F.col(f"`{c}`") for c in order_by]
    packed = F.struct(*ordc, step.alias("_step"))
    arr = F.array_sort(F.collect_list(packed))
    if max_steps is not None:
        if max_steps < 1:
            raise ValueError(
                f"session_paths: max_steps must be >= 1, got {max_steps}")
        arr = F.slice(arr, 1, int(max_steps))
    path = F.array_join(
        F.transform(arr, lambda x: x["_step"]), sep)
    paths = (df.filter(step.isNotNull())
             .groupBy(*keys)
             .agg(path.alias("path")))
    return (paths.groupBy("path")
            .agg(F.count("*").alias("n_sessions"))
            .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
            .limit(int(top_k)))


def time_weighted_avg(
    df: DataFrame,
    partition_by: Sequence[str],
    ts_col: str,
    value_col: str,
    order_tiebreak: Sequence[str] = (),
    digits: int = 4,
) -> DataFrame:
    """W13 (beyond reference): time-weighted average per group — each
    observation holds until the NEXT one, so the mean weights values
    by how long they persisted, not how often they were sampled (the
    TWAP / sensor-duty-cycle semantics: a price quoted once but held
    for an hour outweighs ten quotes in one second; an arithmetic mean
    of irregular samples is sampling-rate bias, not signal).

    Output: one row per group — ``n_points``, ``span_seconds``
    (first→last observation), ``twavg``. The LAST observation bounds
    the integration window and carries no weight (nothing is known
    beyond it); groups with fewer than 2 points or zero span are
    dropped (no time to average over).

    Plan shape: ONE exchange on the group key — ``lead`` over one sort
    produces each interval's duration (exact integer microseconds),
    and the weighted sum partial-aggregates. No joins, no second scan.
    """
    keys = [F.col(f"`{c}`") for c in partition_by]
    v = F.col(f"`{value_col}`")
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" `{ts_col}`)")
    # order by the PROJECTED epoch column (monotonic in ts) — the raw
    # ts column is gone after the select below
    ords = [F.col("_t").asc()] + [
        F.col(f"`{c}`").asc() for c in order_tiebreak]
    w = Window.partitionBy(*keys).orderBy(*ords)
    rows = (df.filter(F.col(f"`{ts_col}`").isNotNull() & v.isNotNull())
            .select(*keys, us.alias("_t"), v.alias("_v"),
                    *[F.col(f"`{c}`") for c in order_tiebreak])
            .withColumn("_dt", F.lead("_t").over(w) - F.col("_t")))
    agg = rows.groupBy(*[F.col(c) for c in partition_by]).agg(
        F.count("*").alias("n_points"),
        F.sum(F.when(F.col("_dt").isNotNull(),
                     F.col("_v") * F.col("_dt").cast("double")))
        .alias("_num"),
        F.sum(F.when(F.col("_dt").isNotNull(), F.col("_dt"))
              .otherwise(F.lit(0)).cast("long")).alias("_den"))
    return (agg.filter((F.col("n_points") >= 2) & (F.col("_den") > 0))
            .select(*[F.col(c) for c in partition_by], "n_points",
                    F.bround(F.col("_den").cast("double")
                             / F.lit(1_000_000.0), 4)
                    .alias("span_seconds"),
                    F.bround(F.col("_num")
                             / F.col("_den").cast("double"), digits)
                    .alias("twavg")))


def seasonal_autocorr(
    df: DataFrame,
    partition_by: Sequence[str],
    ts_col: str,
    lag_hours: int = 24,
    min_pairs: int = 8,
    digits: int = 4,
) -> DataFrame:
    """Seasonal-strength detector: correlation between each hour's
    event count and the count exactly ``lag_hours`` earlier, per
    group — high lag-24 autocorrelation IS daily seasonality (lag-168
    weekly), near zero means the volume has no such rhythm. The
    quantitative answer behind "should this alert threshold be
    time-of-day-aware?".

    Gap-correct by construction: hours pair by TIMESTAMP EQUALITY
    (bucket = bucket_prev + lag), not by row offset, so silent hours
    don't misalign the series the way a ``lag(24 rows)`` window would.
    Output: one row per group — ``n_pairs`` (matched hour pairs) and
    ``acf`` (NULL for a constant series). Groups under ``min_pairs``
    drop.

    Scale (100 TB): events collapse map-side to (group, hour) counts —
    the only fact-table pass; the lag pairing is a self equi-join of
    that hour-sized table on (group, hour−lag) reusing its own
    aggregate output; corr is decomposable. Cost after the first
    aggregate is calendar-sized, not event-sized.
    """
    if lag_hours < 1:
        raise ValueError(
            f"seasonal_autocorr: lag_hours must be >= 1, got {lag_hours}")
    keys = [F.col(f"`{c}`") for c in partition_by]
    hour = F.date_trunc("hour", F.col(f"`{ts_col}`"))
    counts = (df.filter(F.col(f"`{ts_col}`").isNotNull())
              .groupBy(*keys, hour.alias("_h"))
              .agg(F.count("*").alias("_n")))
    prev = counts.select(
        *[F.col(c).alias(f"_p_{c}") for c in partition_by],
        (F.col("_h") + F.expr(f"INTERVAL {int(lag_hours)} HOURS"))
        .alias("_h"),
        F.col("_n").alias("_n_prev"))
    cond = [counts[f"`{c}`"] == prev[f"_p_{c}"] for c in partition_by] \
        + [counts["_h"] == prev["_h"]]
    j = counts.join(prev, cond)
    # try_divide covariance form: ANSI corr() throws on a constant
    # series; NULL is the contract for "no variance to correlate"
    agg = j.groupBy(*[counts[f"`{c}`"] for c in partition_by]).agg(
        F.count("*").alias("n_pairs"),
        F.expr("try_divide(covar_samp(_n, _n_prev), "
               "stddev_samp(_n) * stddev_samp(_n_prev))").alias("_acf"))
    return (agg.filter(F.col("n_pairs") >= min_pairs)
            .select(*[F.col(c) for c in partition_by], "n_pairs",
                    F.bround("_acf", digits).alias("acf")))
