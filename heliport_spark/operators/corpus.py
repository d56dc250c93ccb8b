"""Corpus-profiling and reproducible-sampling operators.

Standard large-scale training-data pipeline steps that sit alongside dedup
and quality filtering:

* ``length_stats`` — per-group exact length/token percentiles (corpus
  profiling before/after filtering). Exact ``percentile`` (continuous
  interpolation), not approx_percentile, so the DuckDB oracle
  (``quantile_cont``) matches bit-for-bit after rounding.
* ``hash_split`` — deterministic train/val/test assignment from a portable
  md5-derived hash of the id (no RNG: the same row lands in the same split
  on any engine, any run, any partitioning — reproducibility at 100 TB).
  Scale note: the split column is a pure projection (no shuffle); the
  per-split counts here are just the oracle-checkable summary.

Both are pure Catalyst; at scale the aggregates are map-side combinable
(counts) or single-shuffle sorted aggregations (percentile).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import n_tokens

# split boundaries over h mod 10: [0,8) train, 8 val, 9 test
SPLIT_BUCKETS = (("train", 0, 8), ("val", 8, 9), ("test", 9, 10))


def split_expr(id_col: Column) -> Column:
    """Deterministic split label from the portable 60-bit md5 hash."""
    from .dedup import h60

    b = F.pmod(h60(id_col.cast("string")), F.lit(10))
    out = F.lit(None).cast("string")
    expr = None
    for name, lo, hi in SPLIT_BUCKETS:
        cond = (b >= lo) & (b < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(out)


def hash_split(df: DataFrame, id_col: str = "doc_id",
               group_cols: "tuple[str, ...]" = ("source",)) -> DataFrame:
    """Per-(group, split) row counts after deterministic assignment."""
    out = df.withColumn("split", split_expr(F.col(id_col)))
    return out.groupBy(*group_cols, "split").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def length_stats(df: DataFrame, text_col: str = "text",
                 group_cols: "tuple[str, ...]" = ("source",)) -> DataFrame:
    """Per-group corpus profile: doc count, exact length percentiles
    (p50/p95), mean length and mean token count."""
    c = F.col(text_col)
    lens = df.select(
        *[F.col(g) for g in group_cols],
        F.length(c).alias("len"),
        n_tokens(c).alias("toks"),
    )
    return lens.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.percentile("len", F.lit(0.5)), 4).alias("p50_len"),
        F.round(F.percentile("len", F.lit(0.95)), 4).alias("p95_len"),
        F.round(F.avg("len"), 4).alias("avg_len"),
        F.round(F.avg("toks"), 4).alias("avg_tokens"),
    )
