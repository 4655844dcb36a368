"""JSONL corpus source (beyond-reference): schema-first reading with a
corrupt-record side output.

Web-scale training corpora arrive as JSONL shards; at 100 TB you never
run schema inference (a full extra pass) and you never let one corrupt
line kill a job — you capture it. This reader takes an EXPLICIT schema
and returns (clean, corrupt): the same contract as the reference's
side-output sink (`export.py` S7 — rows that cannot be processed are
delivered, not dropped; reference: feldman.py's unwritten-rows CSV).

Parsing is one pass of ``from_json`` over a text scan: an unparseable
line yields a NULL struct and lands in the corrupt side with its source
file; blank lines are skipped (the reference's blank-line-skip contract,
tabular/columns.py:58). This formulation side-steps Spark's
``_corrupt_record`` caveat (filtering the native corrupt column from the
same scan is rejected / requires a cache) and keeps both outputs
derivable from one plan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["JsonlRead", "read_jsonl", "jsonl_stats"]


@dataclass
class JsonlRead:
    """Result of :func:`read_jsonl`: ``clean`` rows in the requested
    schema; ``corrupt`` rows as ``(raw, src_file)``.

    ``clean_src`` is ``clean`` plus the captured source-file column —
    the frame :func:`jsonl_stats` aggregates. It carries the ``_src``
    value captured AT PARSE TIME rather than re-evaluating
    ``input_file_name()`` later: that function only yields names inside
    an unshuffled narrow chain over the text scan, so a persisted /
    checkpointed ``clean`` (or any future exchange before the stats
    call) would silently collapse every count under one blank key."""

    clean: DataFrame
    corrupt: DataFrame
    clean_src: DataFrame = None


_CR = "_feldman_corrupt"


def read_jsonl(spark: SparkSession, path: str, schema) -> JsonlRead:
    """Read JSONL under an explicit schema (DDL string or StructType).

    A line is corrupt iff JSON parsing fails outright (detected via the
    in-schema corrupt-record column — Spark's permissive ``from_json``
    returns an all-null struct for malformed input, so a bare null test
    cannot distinguish corrupt from ``{}``); a parseable object with
    missing/extra fields is clean with nulls for the missing fields —
    the permissive semantics corpus ingestion wants. Blank /
    whitespace-only lines are skipped.
    """
    from pyspark.sql.types import StringType, StructType

    if isinstance(schema, StructType):
        user_fields = [f.name for f in schema.fields]
        full = StructType(schema.fields[:]).add(_CR, StringType())
    else:
        base = StructType.fromDDL(schema)
        user_fields = [f.name for f in base.fields]
        full = base.add(_CR, StringType())

    raw = spark.read.text(path).filter(F.trim(F.col("value")) != "")
    parsed = raw.select(
        F.col("value"),
        F.input_file_name().alias("_src"),
        F.from_json(F.col("value"), full,
                    {"columnNameOfCorruptRecord": _CR}).alias("_rec"),
    )
    ok = parsed.filter(F.col(f"_rec.{_CR}").isNull())
    clean = ok.select(*[F.col(f"_rec.{f}").alias(f) for f in user_fields])
    clean_src = ok.select(
        F.col("_src").alias("src_file"),
        *[F.col(f"_rec.{f}").alias(f) for f in user_fields])
    corrupt = parsed.filter(F.col(f"_rec.{_CR}").isNotNull()).select(
        F.col("value").alias("raw"), F.col("_src").alias("src_file"))
    return JsonlRead(clean=clean, corrupt=corrupt, clean_src=clean_src)


def jsonl_stats(read: JsonlRead) -> DataFrame:
    """Per-source-file ingest report: clean/corrupt line counts — the
    monitoring hook an ingestion job emits per run. Two slim aggregates
    over the same one-pass parse; the clean side counts the parse-time
    ``clean_src`` capture, never a re-evaluated ``input_file_name()``
    (empty once any exchange/persist separates the call from the scan)."""
    good = (
        read.clean_src.select("src_file")
        .groupBy("src_file").agg(F.count(F.lit(1)).alias("n_clean"))
    )
    bad = read.corrupt.groupBy("src_file").agg(
        F.count(F.lit(1)).alias("n_corrupt"))
    return (
        good.join(bad, "src_file", "full")
        .select(
            "src_file",
            F.coalesce("n_clean", F.lit(0)).alias("n_clean"),
            F.coalesce("n_corrupt", F.lit(0)).alias("n_corrupt"),
        )
    )
