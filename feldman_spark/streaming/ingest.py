"""Incremental corpus ingestion: process only files not yet seen.

Beyond-reference capability, and the operational shape of a 100 TB
pipeline: the corpus grows by parquet files (crawl drops, upstream
exports); each run must process exactly the new files — no rescans, no
double-processing — and survive crashes mid-run.

Structured Streaming's file source provides all of that for free: the
checkpoint records which input files each epoch consumed, and
``Trigger.AvailableNow`` drains the current backlog and stops, so the
same call works as a cron-driven batch job. Any batch transformation
(dedup, quality filtering, tokenization, splitting — all of
:mod:`feldman_spark.pipeline`) applies unchanged inside ``foreachBatch``.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

__all__ = ["incremental_ingest"]


def incremental_ingest(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    transform: Optional[Callable[[DataFrame], DataFrame]] = None,
    timeout_sec: int = 300,
) -> None:
    """Drain all not-yet-processed parquet files under ``input_dir``
    through ``transform`` and write the result under ``output_dir``, then
    stop. Exactly-once per input file across runs and crashes: the file
    list is committed in ``checkpoint_dir``, and each epoch writes to its
    own ``epoch_id=N`` partition directory with overwrite semantics, so a
    crash between the parquet write and the checkpoint commit replays the
    epoch *over itself* instead of appending duplicates. Readers see an
    extra ``epoch_id`` partition column via ``spark.read.parquet(output_dir)``.
    Re-invoking after new files arrive processes only those files — the
    incremental contract."""
    schema = spark.read.parquet(input_dir).schema  # metadata-only probe
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        out = transform(batch_df) if transform is not None else batch_df
        # idempotent per-epoch sink: a replayed epoch overwrites its own
        # partition, never double-appends
        out.write.mode("overwrite").parquet(f"{output_dir}/epoch_id={epoch_id}")

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination takes SECONDS (PySpark converts to ms internally)
    q.awaitTermination(timeout_sec)
    if q.isActive:  # pragma: no cover - only on pathological hangs
        q.stop()
        raise TimeoutError(f"incremental ingest did not drain in {timeout_sec}s")
