"""Quality-filter decision operators: perplexity, rules, keep/drop (D4/D5/D7).

Everything here is pure Catalyst — ``F.when`` chains and regex counts over
columns produced upstream (langid columns come from operators/identify.py).
The decision contract (north_star): each clip gets ``lang``, ``confidence``,
``keep``, ``scrubbed_text`` + a ``quality`` diagnostic struct; the HeLI label
is authoritative (the fastText cross-check only raises a flag).

Perplexity (D4): the HeLI raw score *is* a mean char-n-gram negative
log10-likelihood with back-off and a 7.0 OOV penalty — i.e. a stupid-backoff
character LM cross-entropy. ``ppl = 10^raw_score`` (KenLM-style scale:
low = fluent in the detected language, ~10^7 = pure OOV junk).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

# Rule thresholds (deterministic; tuned on the synthetic fixtures).
MIN_CHARS = 2
MAX_CHARS = 20_000
MIN_CHARS_PER_SEC = 0.5   # transcript vs audio duration sanity
MAX_CHARS_PER_SEC = 100.0
MAX_DIGIT_RATIO = 0.3
MIN_ALPHA_RATIO = 0.4
MAX_PPL = 10.0 ** 6.5     # raw HeLI score > 6.5 ⇒ essentially all-penalty
# Independent word-LM gate (VERDICT r03 #6): mean −log10 P(word|winner) over
# the ORDER-0 table only, OOV=7.0. Calibrated on deterministic fixtures:
# corpus docs measure ≤4.64, the worst fluent golden row (tso) 5.912,
# half-misspelled English 6.05, fully garbled 7.0. ADVICE r04: 6.0 left a
# 1.5% margin below the worst FLUENT row — far too thin for a DROP rule on
# real multilingual data — so the drop threshold is 6.5 (≈85%+ of words
# OOV): fluent tso clears by 9%, total-garble still drops, and the genuinely
# ambiguous half-misspelled band (≈6.0–6.5) now KEEPS (false drops cost a
# quality filter more than false keeps; the flag threshold is the drop
# threshold — one signal, one semantic). Three exemptions:
#   * cjk_pct > MAX_WORD_CJK_PCT (0.3, widened from the scorer's 0.5
#     boundary): CJK runs tokenize to whitespace tokens the word model
#     never contains, so even MIXED-script rows carry OOV-by-construction
#     tokens that inflate the mean on perfectly fluent text;
#   * winner language in sparse_word_langs(): 14 of 238 collapsed labels
#     have < MIN_WORD_TABLE_POSTINGS order-0 entries (sjk 177 … adz 1926 vs
#     the 9 999 norm) — for them a high OOV rate measures table sparsity,
#     not fluency;
#   * und/zxx rows never reach the rule (lang_undetermined already fired).
MAX_WORD_NLL = 6.5
MAX_WORD_PPL = 10.0 ** MAX_WORD_NLL
MAX_WORD_CJK_PCT = 0.3
MIN_WORD_TABLE_POSTINGS = 2000
MAX_REPETITION_RUN = 3


def sparse_word_langs(
    model_dir: "str | None" = None,
    min_postings: int = MIN_WORD_TABLE_POSTINGS,
) -> "tuple[str, ...]":
    """Collapsed language labels whose order-0 (whole-word) table is too
    sparse for the word-LM signal to be informative (see MAX_WORD_NLL
    notes). Driver-side, one bincount over the mmap'd posting array —
    computed once per quality_filter build, shipped as a literal isin list
    (no per-row cost, no extra broadcast)."""
    import numpy as np

    from ..langs import COLLAPSE, LANGS_ARR, N_LANGS
    from ..model import get_model

    m = get_model(model_dir) if model_dir is not None else get_model()
    counts = np.bincount(m.orders[0].plang, minlength=N_LANGS)
    # a macro label is as word-rich as its richest member
    coll = np.zeros(N_LANGS, dtype=np.int64)
    np.maximum.at(coll, COLLAPSE.astype(np.int64), counts)
    return tuple(sorted(
        str(LANGS_ARR[c])
        for c in set(COLLAPSE.astype(np.int64).tolist())
        if coll[c] < min_postings
    ))


def perplexity(raw_score: Column) -> Column:
    return F.pow(F.lit(10.0), raw_score.cast("double")).alias("ppl")


def rule_conditions(
    text: Column,
    lang: Column,
    ppl: Column,
    dur_ms: "Column | None" = None,
    ft_lang: "Column | None" = None,
    word_ppl: "Column | None" = None,
    cjk_pct: "Column | None" = None,
    word_sparse_langs: "tuple[str, ...] | None" = None,
    qc_keep: "Column | None" = None,
    digit_ratio: "Column | None" = None,
    alpha_ratio: "Column | None" = None,
    rep_cand: "Column | None" = None,
) -> "list[tuple[str, Column]]":
    """The heuristic rule conditions (D5) as (name, fired) pairs.

    ``word_ppl`` (10^word_nll from the independent word-LM, see MAX_WORD_NLL
    above) adds the ``high_word_ppl`` rule — the perplexity signal that can
    fire on fluent-charscore/garbled-words text WITHOUT lang_undetermined
    moving; exempt for mixed/majority-CJK rows (``cjk_pct`` >
    MAX_WORD_CJK_PCT) and for winner languages in ``word_sparse_langs``
    (pass ``sparse_word_langs()``).

    ``qc_keep`` (the trained quality classifier's keep column from
    :func:`classifier_score_df`) adds the ``low_quality_classifier`` rule
    when false — the learned fluency signal next to the heuristic
    families (opt-in via ``quality_filter(with_classifier=True)``).

    ``digit_ratio`` / ``alpha_ratio`` optionally supply precomputed ratio
    columns (bit-identical twins from textstats.py's vectorized pass) in
    place of the per-row JVM regex counts; ``rep_cand`` optionally supplies
    the repetition PRE-FILTER (an over-approximation with exact recall —
    textstats.py docstring) so the expensive backreference regex only runs
    on candidate rows. All three default to the original pure-Catalyst
    expressions.

    Returns the ordered (rule_name, fired_condition) list — the shared
    source for BOTH :func:`flags_from_conditions` (the array column) and
    :func:`keep_from_conditions` (the boolean), so a consumer that only
    reads ``keep`` never pays for building the string array (Catalyst
    prunes the unreferenced flags projection)."""
    nc = T.n_chars(text)
    dr = digit_ratio if digit_ratio is not None else T.digit_ratio(text)
    ar = alpha_ratio if alpha_ratio is not None else T.alpha_ratio(text)
    rep = T.repetition_ratio(text, MAX_REPETITION_RUN) > 0
    if rep_cand is not None:
        # candidate false ⟹ the regex cannot match (proven recall), so the
        # when() gate skips the backreference scan on ~all rows; when() is
        # required (not &) to guarantee the regex is not evaluated
        rep = F.when(rep_cand, rep).otherwise(F.lit(False))
    conds = [
        ("too_short", nc < MIN_CHARS),
        ("too_long", nc > MAX_CHARS),
        ("high_digit", dr > MAX_DIGIT_RATIO),
        ("low_alpha", ar < MIN_ALPHA_RATIO),
        ("repetition", rep),
        ("lang_undetermined", lang.isin("und", "zxx")),
        ("high_ppl", ppl > MAX_PPL),
    ]
    if dur_ms is not None:
        cps = nc.cast("double") / (dur_ms.cast("double") / 1000.0)
        conds.append((
            "rate_anomaly",
            (dur_ms > 0)
            & ((cps < MIN_CHARS_PER_SEC) | (cps > MAX_CHARS_PER_SEC)),
        ))
    if ft_lang is not None:
        conds.append((
            "ft_disagree",
            (~lang.isin("und", "zxx")) & ft_lang.isNotNull()
            & (ft_lang != lang),
        ))
    if word_ppl is not None:
        cond = word_ppl > MAX_WORD_PPL
        if cjk_pct is not None:
            cond = cond & (cjk_pct <= MAX_WORD_CJK_PCT)
        if word_sparse_langs:
            cond = cond & ~lang.isin(*word_sparse_langs)
        conds.append(("high_word_ppl", cond))
    if qc_keep is not None:
        conds.append(("low_quality_classifier", ~qc_keep))
    return conds


def flags_from_conditions(conds: "list[tuple[str, Column]]") -> Column:
    """array<string> of fired rules from :func:`rule_conditions` output.
    array_compact is a native collection expression; the previous
    F.filter(arr, isNotNull) lambda was an interpreted higher-order
    function evaluated per element per row (guide §4.1). Same output:
    NULLs removed, order preserved."""
    return F.array_compact(
        F.array(*[F.when(c, F.lit(name)) for name, c in conds])
    )


def keep_from_conditions(conds: "list[tuple[str, Column]]") -> Column:
    """keep ⟺ no DROP rule condition fired, computed DIRECTLY from the
    conditions instead of via the flags array — identical to
    ``keep_expr(flags_from_conditions(conds))`` (a drop flag is present iff
    its condition is TRUE; NULL conditions emit no flag, hence the
    coalesce), but independent of the array column, so consumers that never
    read ``rule_flags`` (the flagship bench agg, the pipeline counters)
    let Catalyst prune the whole string-array construction."""
    fired = None
    for name, c in conds:
        if name not in DROP_RULES:
            continue
        cb = F.coalesce(c, F.lit(False))
        fired = cb if fired is None else (fired | cb)
    return ~fired if fired is not None else F.lit(True)


def rule_flags(
    text: Column,
    lang: Column,
    ppl: Column,
    dur_ms: "Column | None" = None,
    ft_lang: "Column | None" = None,
    word_ppl: "Column | None" = None,
    cjk_pct: "Column | None" = None,
    word_sparse_langs: "tuple[str, ...] | None" = None,
    qc_keep: "Column | None" = None,
    digit_ratio: "Column | None" = None,
    alpha_ratio: "Column | None" = None,
    rep_cand: "Column | None" = None,
) -> Column:
    """array<string> of fired heuristic rules (D5) — the original public
    form; see :func:`rule_conditions` for the argument docs."""
    return flags_from_conditions(rule_conditions(
        text, lang, ppl, dur_ms=dur_ms, ft_lang=ft_lang, word_ppl=word_ppl,
        cjk_pct=cjk_pct, word_sparse_langs=word_sparse_langs,
        qc_keep=qc_keep, digit_ratio=digit_ratio, alpha_ratio=alpha_ratio,
        rep_cand=rep_cand,
    ))


# Rules that actually drop a clip (ft_disagree is advisory-only, D3).
DROP_RULES = (
    "too_short", "too_long", "high_digit", "low_alpha", "repetition",
    "lang_undetermined", "high_ppl", "high_word_ppl", "rate_anomaly",
    "low_quality_classifier",
)


def keep_expr(flags: Column) -> Column:
    """D7: keep ⟺ no drop-rule fired. Pure Catalyst.

    ``~arrays_overlap`` is the native form of "no element of ``flags`` is a
    drop rule" — the previous size(filter(..., array_contains)) evaluated an
    interpreted lambda per element per row. Identical booleans: ``flags``
    never contains NULLs (rule_flags compacts them) and the drop list is
    literal, so arrays_overlap is a plain deterministic membership test."""
    drops = F.array(*[F.lit(r) for r in DROP_RULES])
    return ~F.arrays_overlap(flags, drops)


# ------------------------------------------------- mixed-language detection

# Segments shorter than this carry too little n-gram signal to label
# reliably (the reference's own goldens are full sentences); they are
# excluded from the mix statistics rather than mislabeled.
LANG_MIX_MIN_SEG_CHARS = 12
# Sentence/line segmentation: newline runs or whitespace after .!?… — a
# deterministic regex split, NOT a model (matches what CCNet-style
# pipelines do before per-segment LID).
LANG_MIX_SPLIT = r"(?<=[.!?…])\s+|\n+"


def lang_mix_df(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id",
                min_seg_chars: int = LANG_MIX_MIN_SEG_CHARS,
                model_dir: "str | None" = None,
                langs: "list[str] | None" = None) -> DataFrame:
    """Per-document language-consistency signal (the CCNet/RefinedWeb
    mixed-language filter): split each doc into sentence/line segments,
    language-identify every segment with the HeLI core, and aggregate —
    (id, n_segs, maj_lang, maj_segs, n_langs, lang_mix_ratio) where
    ``lang_mix_ratio`` is the fraction of labeled segments disagreeing with
    the majority language. Docs with no segment ≥ min_seg_chars emit
    n_segs = 0 with maj_lang NULL (too short to judge — callers decide).

    Majority tie-break is deterministic: higher segment count first, then
    lexicographically smallest language code.

    Scale shape: ONE posexplode (segments ≈ sentences per doc), ONE scalar
    pandas UDF over the segment text only (identify_df — nothing else
    crosses the Arrow boundary), then two hash-aggregates keyed by (id,
    lang) and id plus one tiny row_number window on the per-(id, lang)
    counts. No joins against the corpus; the left join back to ALL input
    ids only restores empty docs."""
    from .identify import identify_df

    segs = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(
                F.split(F.col(text_col), LANG_MIX_SPLIT)
            ).alias("seg_idx", "seg"),
        )
        .withColumn("seg", F.trim("seg"))
        .filter(F.length("seg") >= min_seg_chars)
    )
    labeled = identify_df(
        segs, text_col="seg", ignore_confidence=True,
        model_dir=model_dir, langs=langs,
    ).select("id", "lang")
    per_lang = labeled.groupBy("id", "lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.desc("n"), F.asc("lang"))
    stats = (
        per_lang.withColumn("_rk", F.row_number().over(w))
        .groupBy("id")
        .agg(
            F.sum("n").alias("n_segs"),
            F.count(F.lit(1)).alias("n_langs"),
            F.max(F.when(F.col("_rk") == 1, F.col("lang"))).alias("maj_lang"),
            F.max(F.when(F.col("_rk") == 1, F.col("n"))).alias("maj_segs"),
        )
        .withColumn(
            "lang_mix_ratio",
            F.round(
                (F.col("n_segs") - F.col("maj_segs"))
                / F.col("n_segs").cast("double"),
                6,
            ),
        )
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return (
        ids.join(stats, "id", "left")
        .na.fill({"n_segs": 0, "n_langs": 0, "maj_segs": 0})
        .select(
            "id", "n_segs", "maj_lang", "maj_segs", "n_langs",
            "lang_mix_ratio",
        )
    )


def classifier_score_df(
    df: DataFrame,
    text_col: str = "text",
    model_dir: "str | None" = None,
    score_col: str = "qc_score",
    keep_col: str = "qc_keep",
    threshold: "float | None" = None,
) -> DataFrame:
    """Trained quality-classifier score per document (CCNet/GPT-3/DCLM
    lineage — see quality_train.py for the design and the held-out
    accuracies): appends ``score_col`` (sigmoid in [0, 1]; higher = more
    reference-like) and ``keep_col`` (score ≥ threshold; the threshold
    defaults to the one the artifact was evaluated at).

    Scale shape: ONE scalar pandas UDF over the text column only — the
    1 MB weight table rides a broadcast variable, per-word bucket sums are
    memoized per executor batch stream (crawl vocabulary is Zipfian, so
    the memo's hit rate is the frequent-word mass), and everything else
    stays JVM-side codegen. Same Arrow-pass family as the langid gate;
    a chain using both pays two scalar-UDF passes, each shipping only the
    text column."""

    from ..quality_train import load_quality_params, quality_scores

    w, dense_w, bias, meta_th = load_quality_params(model_dir)
    th = meta_th if threshold is None else threshold
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast((w, dense_w, bias))
    # per-word memo in the CLOSURE, not per batch: the UDF object is
    # deserialized once per task, so batches within a task share it (the
    # "per executor batch stream" contract) — re-hashing the frequent-word
    # vocabulary every ~10k-row Arrow batch was the hot-path waste the r7
    # code review flagged. Bounded like the Scorer memos.
    memo: dict = {}

    @F.pandas_udf("double")
    def qc(texts: pd.Series) -> pd.Series:
        bw, bd, bb = bc.value
        if len(memo) > 200_000:
            memo.clear()  # crawl-scale vocabulary must not grow unbounded
        return pd.Series(quality_scores(texts.tolist(), bw, bd, bb, memo))

    return df.withColumn(score_col, qc(F.col(text_col))).withColumn(
        keep_col, F.col(score_col) >= F.lit(float(th))
    )
