"""Event-stream operators: windowed aggregation and sessionization.

Beyond-reference capability (the reference is strictly batch,
SURVEY §2.10). Transformations are written once against a DataFrame and
work identically on a batch frame and a ``readStream`` frame — the
Structured Streaming contract. Batch mode is what the DuckDB oracle
checks; :func:`stream_events` + :func:`run_stream_to_memory` drive the
same plan through a real micro-batch streaming query.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "sessionize",
    "session_stats",
    "sessionize_native",
    "interval_join",
    "enrich",
    "dedup_native",
    "running_totals_native",
    "stream_events",
    "run_stream_to_memory",
]


def _watermarkable(df: DataFrame, ts_col: str) -> DataFrame:
    """``withWatermark`` requires TIMESTAMP (with time zone) event time;
    Spark 4.1's parquet reader surfaces naive timestamps as TIMESTAMP_NTZ,
    which it rejects. Cast NTZ → TIMESTAMP (a wall-clock reinterpretation
    in ``spark.sql.session.timeZone`` — no data movement, and deterministic
    only per session zone: watermark/window boundaries shift if the zone
    differs between runs. :func:`feldman_spark.session.get_spark` pins
    the session zone to UTC so batch/stream parity holds across
    environments; under a foreign session, pin the zone yourself)."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def tumbling_agg(
    events: DataFrame,
    window_len: str = "1 hour",
    ts_col: str = "ts",
    watermark: Optional[str] = None,
) -> DataFrame:
    """Tumbling event-time windows: count + value sum per (window, type).
    With ``watermark`` set (streaming), late events beyond the bound are
    dropped and state is evicted — required for unbounded sources."""
    df = events
    if watermark:
        df = _watermarkable(df, ts_col).withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window_len).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("value_sum"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type", "n", "value_sum",
        )
    )


def sliding_agg(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    watermark: Optional[str] = None,
) -> DataFrame:
    """Sliding event-time windows (each event lands in len/slide windows)."""
    df = events
    if watermark:
        df = _watermarkable(df, ts_col).withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window_len, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "n",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization (batch form): a new session starts when a
    user's inter-event gap exceeds ``gap_minutes``; session id = running
    count of session starts. One shuffle on the user key, then two window
    passes — the classic lag+cumsum formulation.

    The streaming twin of this operator is a
    ``session_window``/``applyInPandasWithState`` aggregation; the batch
    form is the oracle-checkable ground truth.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    gap_s = gap_minutes * 60
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap_s),
        1,
    ).otherwise(0)
    with_id = events.withColumn("_new", new_session).withColumn(
        "session_id", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("bigint"))
    return (
        with_id.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
    )


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    quantiles=(0.5, 0.9),
    digits: int = 4,
) -> DataFrame:
    """Corpus-level session rollup over :func:`sessionize`'s gap
    semantics: ONE summary row ``(n_sessions, n_users, bounce_rate,
    avg_events, p<q>_duration_s...)`` — session count, bounce fraction
    (single-event sessions), mean events per session, and exact
    percentiles of session duration in whole seconds.

    Scale shape: the lag+cumsum session labeling is one user-keyed
    exchange (same as sessionize); per-session collapse reuses that
    partitioning; the percentile aggregates one duration per SESSION,
    not per event."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    gap_s = gap_minutes * 60
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col))
            - F.unix_timestamp(prev_ts)) > gap_s),
        1,
    ).otherwise(0)
    per_session = (
        events.withColumn("_new", new_session)
        .withColumn("session_id", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            (F.unix_timestamp(F.max(ts_col))
             - F.unix_timestamp(F.min(ts_col))).alias("_dur"),
        )
    )
    qarr = ", ".join(str(q) for q in quantiles)
    agg = per_session.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.countDistinct(user_col).cast("bigint").alias("n_users"),
        F.sum((F.col("_n") == 1).cast("long")).alias("_bounces"),
        F.avg("_n").alias("_avg_n"),
        F.expr(f"percentile(_dur, array({qarr}))").alias("_q"),
    )
    qcols = [
        F.round(F.element_at("_q", i + 1), digits)
        .alias(f"p{int(q * 100):02d}_duration_s")
        for i, q in enumerate(quantiles)
    ]
    return agg.select(
        "n_sessions", "n_users",
        F.round(F.col("_bounces")
                / F.when(F.col("n_sessions") > 0, F.col("n_sessions")), 6)
        .alias("bounce_rate"),
        F.round("_avg_n", digits).alias("avg_events"),
        *qcols,
    )


def sessionize_native(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: Optional[str] = None,
) -> DataFrame:
    """Sessionization via the native ``session_window`` — the same plan
    runs in batch and under ``readStream``: with a watermark set, Spark
    finalizes a session and evicts its state once the watermark passes
    the session close (last event + gap), which the lag+cumsum batch
    formulation cannot do on an unbounded stream.

    Boundary semantics differ from :func:`sessionize` by an instant: an
    event arriving exactly ``gap`` after the previous one starts a NEW
    session here (window end is exclusive; new-session condition is
    diff >= gap) vs. diff > gap for the lag-based form."""
    df = events
    if watermark:
        df = _watermarkable(df, ts_col).withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("value_sum"))
        .select(
            user_col,
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events", "value_sum",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "5 minutes",
    watermark: Optional[str] = None,
) -> DataFrame:
    """Stream-stream INTERVAL join: each left event matches the right
    events of the same ``key`` whose timestamp falls in
    ``[left_ts, left_ts + within]`` — the click/view-attribution shape
    of an event pipeline.

    The same plan runs in batch (the DuckDB-oracle ground truth) and
    under two ``readStream`` sources. Streaming-correctness requirements
    baked in (Spark refuses the join without them):

    * BOTH sides carry a watermark — late input past it is dropped;
    * the join condition bounds event-time distance in BOTH directions
      (``right_ts >= left_ts`` and ``right_ts <= left_ts + within``),
      which lets the state store evict a buffered row as soon as the
      other side's watermark passes its match window — state is
      O(rate × (watermark + within)), not unbounded.

    Column names must be disjoint apart from ``key`` (rename before
    joining, as the contract query does). Inner join; append output.
    """
    l = left
    r = right
    if watermark:
        l = _watermarkable(l, left_ts).withWatermark(left_ts, watermark)
        r = _watermarkable(r, right_ts).withWatermark(right_ts, watermark)
    else:
        l = _watermarkable(l, left_ts)
        r = _watermarkable(r, right_ts)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond).drop(r[key])


def stream_events(spark: SparkSession, parquet_dir: str, schema=None) -> DataFrame:
    """A real ``readStream`` over a parquet directory (file micro-batch
    source). Schema must be supplied or inferable from existing files."""
    if schema is None:
        schema = spark.read.parquet(parquet_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(parquet_dir)
    )


def run_stream_to_memory(
    transformed: DataFrame, name: str, timeout_s: int = 60, output_mode: str = "complete",
) -> None:
    """Run a streaming plan into an in-memory sink until the source is
    drained (processAllAvailable), then stop. Test/demo harness."""
    q = (
        transformed.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def enrich(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    dim_key: str,
    dim_cols: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment: join the (possibly streaming)
    event feed against a small static dimension, broadcast. Under
    ``readStream`` this is Spark's stream-static join — stateless, no
    watermark needed, the dimension re-broadcast per micro-batch (so a
    refreshed dim table is picked up on the next batch). The same plan
    runs in batch for the value-level oracle; the streaming twin is
    pytest-verified.

    100 TB posture: the event side is unbounded and never shuffles — the
    broadcast hash join is map-side; only ``dim_cols`` of the dimension
    ship to executors.
    """
    d = dim.select(F.col(dim_key).alias(on), *[F.col(c) for c in dim_cols])
    return events.join(F.broadcast(d), on, how)


def dedup_native(
    stream: DataFrame,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup with Spark's NATIVE state operator:
    ``dropDuplicatesWithinWatermark`` — first arrival of each key emits
    immediately (append mode), later copies inside the watermark horizon
    are suppressed, and per-key state is evicted once the watermark
    passes (a copy arriving later than the horizon would re-emit: the
    horizon IS the dedup contract, which is what bounds state on an
    unbounded stream).

    This is the corpus-scale path: state lives in the JVM state store
    (RocksDB-shardable), keys never touch Python. The
    applyInPandasWithState twin (`streaming/stateful.py::streaming_dedup`)
    demonstrates arbitrary custom state but pays a Python function call
    PER KEY — measured 380 s vs ~4 s here at sf1's 1M-key stream — so
    use it for bounded key sets (per-user/per-session state), never for
    unbounded dedup keys.
    """
    df = _watermarkable(stream, ts_col).withWatermark(ts_col, watermark)
    return df.dropDuplicatesWithinWatermark(list(keys))


def running_totals_native(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) as a NATIVE streaming aggregation:
    ``groupBy().agg()`` in update mode — each micro-batch emits the keys
    it touched with their totals-so-far, state lives in the JVM state
    store (RocksDB-shardable), keys never cross into Python.

    This is the corpus-scale path for unbounded key sets — the
    `dedup_native` precedent applied to running aggregates. The
    ``applyInPandasWithState`` twin
    (:func:`feldman_spark.streaming.stateful.streaming_running_totals`)
    pays a Python function call PER KEY per micro-batch and earns its
    keep only when the per-key update logic is genuinely custom; for
    plain count/sum the built-in operator is the same answer at state
    store speed. The same plan runs in batch for the value oracle.

    Running totals are deliberately unwindowed: state is one row per
    distinct key forever (the running-total contract). If the key space
    is unbounded AND totals may age out, add an event-time window +
    watermark instead — this operator is for live per-entity counters.
    """
    return (
        stream.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum(value_col), 2).alias("value_sum"))
    )
