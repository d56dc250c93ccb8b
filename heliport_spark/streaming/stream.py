"""Structured Streaming front-end for the quality-filter pipeline.

The reference processes an unbounded stdin line stream in batches
(/root/reference/src/cli/identify.rs:177-200); the Spark-native equivalent is
Structured Streaming: ``readStream`` → the same `quality_filter` DataFrame
graph (it is stream-safe: one scalar pandas UDF + stateless Catalyst exprs)
→ ``writeStream`` with checkpointing.

Also provides a windowed per-language throughput aggregation with a
watermark for late events — the streaming twin of pipeline.lang_stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import quality_filter
from ..sources.clips import CLIPS_SCHEMA


def stream_clips_from_directory(spark: SparkSession, input_dir: str,
                                max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream of clips parquet dropped into a directory."""
    return (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def streaming_quality_filter(clips_stream: DataFrame,
                             model_dir: "str | None" = None) -> DataFrame:
    """The batch pipeline applied to a stream (stateless → trivially
    stream-safe; no watermark needed)."""
    return quality_filter(clips_stream, model_dir=model_dir, with_ft=False)


def start_pipeline_stream(
    clips_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    model_dir: "str | None" = None,
    trigger_seconds: int = 5,
):
    """Stream clips → decisions → partitioned parquet sink with exactly-once
    file-sink semantics (checkpointed offsets + commit log)."""
    out = streaming_quality_filter(clips_stream, model_dir=model_dir)
    return (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .outputMode("append")
        .start()
    )


def windowed_lang_counts(
    scored_stream: DataFrame,
    event_time_col: str = "event_time",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-language windowed counts with late-data watermark (the streaming
    aggregation pattern from SURVEY's engine-side additions)."""
    return (
        scored_stream.withWatermark(event_time_col, watermark)
        .groupBy(F.window(F.col(event_time_col), window), F.col("lang"))
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
        )
    )
