"""Model-training operators (reference T1-T9) as reusable DataFrame transforms.

These are the reference's *relational* operators (SURVEY.md §2.4) — n-gram
counting, top-k truncation, relative-frequency pruning, probability
computation, posting-list merge — re-expressed as Spark aggregations so they
run distributed over a corpus table instead of rayon-over-files:

* T1 hash-agg n-gram counts   (/root/reference/src/trainer.rs:25-63)
* T2 totals                   (trainer.rs:97,105)
* T3 top-k per (lang, order)  (trainer.rs:106-108; k=10000 default,
                               src/cli/create_models.rs:19-25)
* T5 rel-freq pruning > 5e-7  (heliport-model/src/languagemodel.rs:44,150-156)
* T6 prob = -log10(count/langamount), langamount = retained sum
                               (languagemodel.rs:151-165)
* T7 posting merge gram→langs (languagemodel.rs:164-173)

Scale notes: counting is a map-side-combinable hash aggregate (Catalyst emits
partial_count automatically); top-k uses a window per (lang) partition —
skew-prone on giant languages, so rank only after the count aggregation has
already collapsed cardinality. The char-n-gram explode stays JVM-side
(sequence+transform+explode), no Python.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — needed at module scope so pyspark can
# resolve the (stringified, PEP-563) pd.Series type hints of the scrub UDF
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


_KEEP_TABLE = None


def _get_keep_table():
    """RE_NON_ALPHA keep table (trainer.rs:33, utils.rs:8-11): mmap the
    compiled artifact when present, else rebuild from chartables."""
    global _KEEP_TABLE
    if _KEEP_TABLE is None:
        import os

        import numpy as np

        from ..model import DEFAULT_MODEL_DIR

        path = os.path.join(str(DEFAULT_MODEL_DIR), "keep_table.npy")
        if os.path.exists(path):
            _KEEP_TABLE = np.load(path, mmap_mode="r")
        else:
            from ..chartables import build_keep_table

            _KEEP_TABLE = build_keep_table()
    return _KEEP_TABLE


def nonalpha_scrub_udf():
    """Scalar pandas UDF: replace every char outside the RE_NON_ALPHA keep
    set with a space — the trainer's preprocessing (trainer.rs:33). One
    codepoint-table pass over the whole Arrow batch (single encode/decode),
    no per-char Python. No lowercasing: the reference trainer keeps case."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def scrub(texts: pd.Series) -> pd.Series:
        import numpy as np

        keep = _get_keep_table()
        # preserve NULL (DuckDB regexp_replace(NULL,...) is NULL; silently
        # turning NULL into '' breaks null-propagation parity)
        nulls = [t is None for t in texts]
        tl = ["" if t is None else str(t) for t in texts]
        joined = "\n".join(tl)
        if not joined:
            return pd.Series([None if z else t for z, t in zip(nulls, tl)])
        cp = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4")
        cp = np.where(keep[cp], cp, np.uint32(0x20))
        cleaned = cp.tobytes().decode("utf-32-le")
        out, pos = [], 0
        for z, t in zip(nulls, tl):
            out.append(None if z else cleaned[pos : pos + len(t)])
            pos += len(t) + 1  # 1:1 replacement keeps offsets; +1 skips the sep
        return pd.Series(out)

    return scrub


def words_expr(text: Column) -> Column:
    """Whitespace tokens (empty/blank → empty array). Matches the trainer's
    split_whitespace (trainer.rs:36) modulo the non-alpha replacement, which
    callers apply upstream if they want full training parity (see
    nonalpha_scrub_udf; cmd_create_model applies it)."""
    from ..functions.text import ws_strip

    t = ws_strip(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def char_ngrams_expr(word: Column, n: int) -> Column:
    """All char n-grams of ``' word '`` (space-padded, trainer.rs:48-52),
    pure Catalyst: substring over a generated index sequence.

    Guarded for short words: ``F.sequence(1, stop)`` DESCENDS when stop < 1
    (sequence(1,-2) = [1,0,-1,-2]), which would emit duplicated/truncated
    bogus grams for any padded word shorter than n — the reference trainer
    emits none. Words shorter than n-2 yield an empty array instead.
    """
    padded = F.concat(F.lit(" "), word, F.lit(" "))
    return F.when(
        F.length(padded) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(padded) - F.lit(n - 1)),
            lambda i: padded.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def count_words(df: DataFrame, text_col: str = "text",
                group_cols: "list[str]" = ()) -> DataFrame:
    """T1 (order=word): explode words → hash-agg counts."""
    cols = [F.col(c) for c in group_cols]
    return (
        df.select(*cols, F.explode(words_expr(F.col(text_col))).alias("gram"))
        .groupBy(*cols, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_char_ngrams(df: DataFrame, n: int, text_col: str = "text",
                      group_cols: "list[str]" = ()) -> DataFrame:
    """T1 (order=n): explode char n-grams of every space-padded word.

    The gram fan-out is the codegen'd ``explode(sequence) + substr(col,
    col)`` shape, not ``char_ngrams_expr``'s transform-HOF — higher-order
    functions are interpreted per element (same finding as dedup.py's
    ``_shingle_rows``, where the HOF form measured 3× slower). Words with
    padded length < n emit no index row, matching the HOF form's empty
    array under explode — row-identical output."""
    cols = [F.col(c) for c in group_cols]
    words = df.select(
        *cols, F.explode(words_expr(F.col(text_col))).alias("w")
    )
    padded = words.select(
        *cols, F.concat(F.lit(" "), F.col("w"), F.lit(" ")).alias("pw")
    ).filter(F.length("pw") >= n)
    grams = padded.select(
        *cols, "pw",
        F.explode(
            F.sequence(F.lit(1), F.length("pw") - F.lit(n - 1))
        ).alias("i"),
    ).select(*cols, F.col("pw").substr(F.col("i"), F.lit(n)).alias("gram"))
    return grams.groupBy(*cols, "gram").agg(F.count(F.lit(1)).alias("cnt"))


def top_k(counts: DataFrame, k: int, partition_cols: "list[str]" = ()) -> DataFrame:
    """T3: k most frequent per partition, deterministic tie-break on gram."""
    w = Window.partitionBy(*[F.col(c) for c in partition_cols]).orderBy(
        F.desc("cnt"), F.asc("gram")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def prune_and_probs(counts: DataFrame, partition_cols: "list[str]",
                    max_used: float = 5e-7) -> DataFrame:
    """T5+T6: relative-frequency prune against the partition total, then
    -log10(count / retained-sum). The reference's take-while over desc-sorted
    files ≡ a plain filter because the threshold is monotone in count."""
    w = Window.partitionBy(*[F.col(c) for c in partition_cols])
    with_total = counts.withColumn("total", F.sum("cnt").over(w))
    retained = with_total.filter(
        F.col("cnt").cast("double") / F.col("total") > max_used
    )
    # same spec as w — the pre-/post-filter distinction comes from WHERE the
    # window is applied (over `retained`), not from a different spec
    return (
        retained.withColumn("langamount", F.sum("cnt").over(w))
        .withColumn(
            "prob", -F.log10(F.col("cnt").cast("double") / F.col("langamount"))
        )
        .drop("total")
    )


def posting_lists(probs: DataFrame, gram_col: str = "gram",
                  lang_col: str = "lang") -> DataFrame:
    """T7: gram → sorted postings (exploded as rows for oracle portability):
    output (gram, n_langs, langs_csv)."""
    return probs.groupBy(gram_col).agg(
        F.countDistinct(lang_col).alias("n_langs"),
        F.concat_ws(",", F.sort_array(F.collect_set(lang_col))).alias("langs_csv"),
    )
