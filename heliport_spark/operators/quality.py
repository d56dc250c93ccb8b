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
# the ORDER-0 table only, OOV=7.0 — fires when ≳⅔ of the words are OOV for
# the winner language. Calibrated on deterministic fixtures: corpus docs
# measure ≤4.64, the worst fluent golden row (tso) 5.912, half-misspelled
# English 6.05, fully garbled ≥6.69. NOT applied to majority-CJK rows:
# CJK tokenizes to single chars, which the word model never contains
# (wnll=7.0 on perfectly fluent cmn — the char n-gram score is the only
# meaningful signal there, same >0.5 boundary the scorer's CJK override uses).
MAX_WORD_NLL = 6.0
MAX_WORD_PPL = 10.0 ** MAX_WORD_NLL
MAX_REPETITION_RUN = 3


def perplexity(raw_score: Column) -> Column:
    return F.pow(F.lit(10.0), raw_score.cast("double")).alias("ppl")


def rule_flags(
    text: Column,
    lang: Column,
    ppl: Column,
    dur_ms: "Column | None" = None,
    ft_lang: "Column | None" = None,
    word_ppl: "Column | None" = None,
    cjk_pct: "Column | None" = None,
) -> Column:
    """array<string> of fired heuristic rules (D5). Empty array = clean.

    ``word_ppl`` (10^word_nll from the independent word-LM, see MAX_WORD_NLL
    above) adds the ``high_word_ppl`` rule — the perplexity signal that can
    fire on fluent-charscore/garbled-words text WITHOUT lang_undetermined
    moving; gated off majority-CJK rows via ``cjk_pct``."""
    nc = T.n_chars(text)
    flags = [
        F.when(nc < MIN_CHARS, F.lit("too_short")),
        F.when(nc > MAX_CHARS, F.lit("too_long")),
        F.when(T.digit_ratio(text) > MAX_DIGIT_RATIO, F.lit("high_digit")),
        F.when(T.alpha_ratio(text) < MIN_ALPHA_RATIO, F.lit("low_alpha")),
        F.when(
            T.repetition_ratio(text, MAX_REPETITION_RUN) > 0, F.lit("repetition")
        ),
        F.when(lang.isin("und", "zxx"), F.lit("lang_undetermined")),
        F.when(ppl > MAX_PPL, F.lit("high_ppl")),
    ]
    if dur_ms is not None:
        cps = nc.cast("double") / (dur_ms.cast("double") / 1000.0)
        flags.append(
            F.when(
                (dur_ms > 0)
                & ((cps < MIN_CHARS_PER_SEC) | (cps > MAX_CHARS_PER_SEC)),
                F.lit("rate_anomaly"),
            )
        )
    if ft_lang is not None:
        flags.append(
            F.when(
                (~lang.isin("und", "zxx")) & ft_lang.isNotNull()
                & (ft_lang != lang),
                F.lit("ft_disagree"),
            )
        )
    if word_ppl is not None:
        cond = word_ppl > MAX_WORD_PPL
        if cjk_pct is not None:
            cond = cond & (cjk_pct <= 0.5)
        flags.append(F.when(cond, F.lit("high_word_ppl")))
    arr = F.array(*flags)
    return F.filter(arr, lambda x: x.isNotNull())


# Rules that actually drop a clip (ft_disagree is advisory-only, D3).
DROP_RULES = (
    "too_short", "too_long", "high_digit", "low_alpha", "repetition",
    "lang_undetermined", "high_ppl", "high_word_ppl", "rate_anomaly",
)


def keep_expr(flags: Column) -> Column:
    """D7: keep ⟺ no drop-rule fired. Pure Catalyst."""
    drops = F.array(*[F.lit(r) for r in DROP_RULES])
    return F.size(F.filter(flags, lambda x: F.array_contains(drops, x))) == 0
