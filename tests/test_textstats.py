"""Exactness contract of heliport_spark/textstats.py (OPTIMIZATION r08).

The pipeline's rule statistics moved from JVM regex expressions into one
vectorized numpy pass inside the identify UDF. These tests pin the contract:

* digit_ratio / alpha_ratio are BIT-IDENTICAL to the Catalyst expressions
  they replace (including the Java-vs-Python Unicode-version letter drift);
* rep_cand / scrub_cand have EXACT RECALL over the regexes they gate (a
  false positive costs time, a false negative would change keep decisions);
* the end-to-end pipeline output equals the pure-JVM expression path.
"""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from heliport_spark import textstats
from heliport_spark.functions.scrub import (
    SCRUB_PATTERNS,
    TOXICITY_PATTERN,
    scrub_gate,
)
from heliport_spark.functions import text as T

# Edge rows: empties/NULL-ish, casing, CJK, astral, combining marks, digits,
# phone/ssn shapes, toxicity casings, repetition boundary anatomy (suffix
# tokens after punctuation, sub-token final matches, ASCII-ci casing).
EDGE_TEXTS = [
    None, "", " ", "\t\n\x0b\x0c\r", "a", "1", "İstanbul", "ıi", "ß ẞ",
    "É é Édy édy", "你好世界 hello", "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𐐷𐐷", "é combining",
    "word 123 mix 456-789", "123-45-6789", "+1 (555) 123-4567",
    "call 5551234567 now", "12345678", "1234567", "(1) (2) (3) (4)",
    "a 1 b 2 c 3 d 4 e 5", "BADWORD", "BadWord here", "xslurword",
    "expletive!", "spam spam spam spam", "spam spam spam", "Spam sPAM SPAM spam",
    "a-spam spam spam spam", "spam spam spam spamX", "spam spam spam spam!",
    "x spam  spam\tspam\nspam y", "ab ab ab ab ab", "no repeats here at all",
    "aa ab ac ad", "é é é é", "word, word, word, word,",
]


def _fuzz_texts(n: int = 400, seed: int = 8) -> "list[str]":
    rng = random.Random(seed)
    vocab = ["spam", "Spam", "ab", "a1", "x-y", "123", "45-67", "(55)",
             "你好", "é", "badword", "value", "w.rd", "+1", "...", "##",
             "spa", "am", "spamX", "Xspam", "spam-", "-spam", "SPAM!"]
    out = []
    for _ in range(n):
        k = rng.randint(0, 14)
        toks = [rng.choice(vocab) for _ in range(k)]
        # occasionally force runs
        if k and rng.random() < 0.4:
            t = rng.choice(vocab)
            pos = rng.randrange(k)
            toks[pos:pos] = [t] * rng.randint(2, 5)
        sep = rng.choice([" ", "  ", "\t", " \n"])
        out.append(sep.join(toks))
    return out


ALL_TEXTS = EDGE_TEXTS + _fuzz_texts()


@pytest.fixture(scope="module")
def jvm_frame(spark):
    rows = [(i, t) for i, t in enumerate(ALL_TEXTS)]
    df = spark.createDataFrame(rows, ["i", "t"])
    c = F.col("t")
    got = df.select(
        "i",
        T.digit_ratio(c).alias("dr"),
        T.alpha_ratio(c).alias("ar"),
        (T.repetition_ratio(c, 3) > 0).alias("rep"),
        scrub_gate(c).alias("gate"),
        c.rlike(dict(SCRUB_PATTERNS)["phone"]).alias("phone"),
        c.rlike(dict(SCRUB_PATTERNS)["ssn"]).alias("ssn"),
        c.rlike(TOXICITY_PATTERN).alias("tox"),
    ).collect()
    return {r["i"]: r for r in got}


def test_ratios_bit_identical_to_jvm(jvm_frame):
    dr, ar, rep_cand, scrub_cand = textstats.text_stats_batch(ALL_TEXTS)
    for i, t in enumerate(ALL_TEXTS):
        j = jvm_frame[i]
        # JVM _ratio yields 0.0 for empty, NULL text -> 0.0 via otherwise()
        want_dr = 0.0 if j["dr"] is None else j["dr"]
        want_ar = 0.0 if j["ar"] is None else j["ar"]
        assert dr[i] == want_dr, (i, t, dr[i], want_dr)
        assert ar[i] == want_ar, (i, t, ar[i], want_ar)


def test_rep_cand_exact_recall(jvm_frame):
    _, _, rep_cand, _ = textstats.text_stats_batch(ALL_TEXTS)
    for i, t in enumerate(ALL_TEXTS):
        if jvm_frame[i]["rep"]:  # regex matched -> candidate MUST be true
            assert rep_cand[i], (i, t)


def test_scrub_cand_exact_recall(jvm_frame):
    _, _, _, scrub_cand = textstats.text_stats_batch(ALL_TEXTS)
    for i, t in enumerate(ALL_TEXTS):
        j = jvm_frame[i]
        if j["phone"] or j["ssn"] or j["tox"]:
            assert scrub_cand[i], (i, t)


def test_letter_table_matches_jvm_sampled(spark):
    """Sampled differential sweep of the \\p{L} table against THE JVM —
    includes every boundary of the hardcoded Java-missing ranges (the
    Unicode 14-vs-13 drift) plus a seeded random sample of the full plane.
    The full 0x110000 sweep that generated the ranges lives in
    OPTIMIZATION_r08.md; this keeps a fast regression tripwire."""
    rng = random.Random(13)
    cps = set(rng.randrange(0x110000) for _ in range(20000))
    for a, b in textstats._JAVA_MISSING_LETTER_RANGES:
        cps.update((a - 1, a, b, b + 1))
    cps.update(range(0x0, 0x300))  # dense ASCII/Latin coverage
    cps = sorted(c for c in cps if not (0xD800 <= c <= 0xDFFF) and c < 0x110000)
    df = spark.createDataFrame([(c, chr(c)) for c in cps], ["cp", "ch"])
    got = df.select(
        "cp",
        (F.length(F.regexp_replace(F.col("ch"), r"\p{L}+", "")) == 0).alias("l"),
    ).collect()
    table = textstats.java_letter_table()
    bad = [(r["cp"], bool(r["l"]), bool(table[r["cp"]]))
           for r in got if bool(r["l"]) != bool(table[r["cp"]])]
    assert not bad, f"letter table drift vs JVM: {bad[:10]}"


def test_scrub_apply_equals_scrub_expr(spark):
    """scrub_apply (gated, wrapped-pattern spans twin) ≡ the inline
    scrub_expr chain on every edge/fuzz row — pins that the (?:...)
    wrapping and the gate are value-neutral."""
    from heliport_spark.functions.scrub import scrub_apply, scrub_expr

    rows = [(i, t) for i, t in enumerate(ALL_TEXTS)]
    df = spark.createDataFrame(rows, ["i", "t"])
    text_e, spans_e = scrub_expr("t")
    ref = df.select("i", text_e.alias("st"), spans_e.alias("ss"))
    got = scrub_apply(df, "t", text_out="st", spans_out="ss").select(
        "i", "st", "ss"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_pipeline_equals_pure_jvm_path(spark):
    """End-to-end: quality_filter (textstats path) ≡ the pure-JVM expression
    path on the derived clips table + the edge rows above."""
    from heliport_spark.functions.scrub import scrub_apply
    from heliport_spark.operators.identify import identify_df
    from heliport_spark.operators.quality import (
        keep_expr,
        perplexity,
        rule_flags,
        sparse_word_langs,
    )
    from heliport_spark.pipeline import quality_filter
    from heliport_spark.sources.clips import clips_from_documents, make_clips

    clips = clips_from_documents(spark, "/root/testdata/sf0.001",
                                 with_bytes=False)
    edge = make_clips(
        spark,
        [(f"edge-{i:04d}", t if isinstance(t, str) else "")
         for i, t in enumerate(ALL_TEXTS)],
    ).select(*clips.columns)
    clips = clips.unionByName(edge)

    def old_filter(df, text_col="transcript"):
        scored = identify_df(df, text_col=text_col, with_ft=True,
                             with_word_nll=True)
        ppl = perplexity(F.col("raw_score"))
        word_ppl = F.pow(F.lit(10.0), F.col("word_nll").cast("double"))
        flags = rule_flags(
            F.col(text_col), F.col("lang"), ppl, dur_ms=F.col("dur_ms"),
            ft_lang=F.col("ft_lang"), word_ppl=word_ppl,
            cjk_pct=F.col("cjk_pct"),
            word_sparse_langs=sparse_word_langs(None),
        )
        out = scrub_apply(scored.withColumn("ppl", ppl), text_col)
        out = out.withColumn("rule_flags", flags)
        return out.withColumn("keep", keep_expr(F.col("rule_flags")))

    cols = lambda d, ss, rf: d.select(  # noqa: E731
        "clip_id", "lang", "keep", "scrubbed_text",
        F.col(ss).alias("ss"), F.concat_ws("|", rf).alias("rf"),
    )
    new = cols(quality_filter(clips), "quality.scrub_spans",
               "quality.rule_flags")
    old = cols(old_filter(clips), "scrub_spans", "rule_flags")
    a = sorted(map(tuple, new.collect()))
    b = sorted(map(tuple, old.collect()))
    assert a == b
