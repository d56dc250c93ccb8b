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


def streaming_exact_dedup(
    clips_stream: DataFrame,
    text_col: str = "transcript",
    id_col: str = "clip_id",
    n_buckets: int = 64,
):
    """Custom stateful streaming operator: exact dedup across the whole
    stream via ``applyInPandasWithState``.

    State is partitioned by a fingerprint hash bucket (bounded cardinality →
    bounded state partitions); each bucket's state holds the set of
    fingerprints already emitted. First occurrence passes through, later
    duplicates are dropped — across triggers, surviving restarts through the
    checkpoint. This is the streaming twin of operators/dedup.exact_dedup.
    """
    from pyspark.sql.streaming.state import GroupState
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    import pandas as pd

    out_schema = StructType(
        [
            StructField(id_col, StringType()),
            StructField(text_col, StringType()),
            StructField("fp", StringType()),
        ]
    )
    state_schema = StructType([StructField("seen", StringType())])

    def dedup_fn(key, pdfs, state: GroupState):
        seen = set()
        if state.exists:
            (blob,) = state.get
            if blob:
                seen = set(blob.split("\x00"))
        rows_id, rows_text, rows_fp = [], [], []
        for pdf in pdfs:
            for cid, text, fp in zip(pdf[id_col], pdf[text_col], pdf["fp"]):
                if fp not in seen:
                    seen.add(fp)
                    rows_id.append(cid)
                    rows_text.append(text)
                    rows_fp.append(fp)
        state.update(("\x00".join(sorted(seen)),))
        yield pd.DataFrame({id_col: rows_id, text_col: rows_text, "fp": rows_fp})

    from ..functions.text import fingerprint

    with_fp = clips_stream.select(
        F.col(id_col),
        F.col(text_col),
        fingerprint(F.col(text_col)).alias("fp"),
    ).withColumn(
        "bucket",
        F.pmod(F.xxhash64(F.col("fp")), F.lit(n_buckets)).cast("int"),
    )
    return with_fp.groupBy("bucket").applyInPandasWithState(
        dedup_fn, out_schema, state_schema, "append", "NoTimeout"
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
