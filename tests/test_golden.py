"""Reference golden fixtures, ported verbatim (SURVEY.md §5, FIXTURES.md F2).

Sources: 13-sentence corpus + expected (lang, score@4dp)
(/root/reference/src/identifier.rs:384-456), the confidence-off quirk
(identifier.rs:458-470), and the "ación" model-load golden
(/root/reference/heliport-model/src/languagemodel.rs:376-418).
"""

import numpy as np
import pytest

from heliport_spark.langs import LANGS
from heliport_spark.model import get_model, hash_grams
from heliport_spark.sources.clips import GOLDEN_LABELS, GOLDEN_SENTS

ACION_EXPECTED = [
    ("ayr", 4.2864), ("cat", 3.3738), ("epo", 4.5279), ("ext", 2.5946),
    ("gla", 4.7052), ("glg", 2.3187), ("grn", 3.1886), ("kac", 5.5483),
    ("lmo", 5.2805), ("nhn", 5.0726), ("que", 3.8049), ("spa", 2.3923),
    ("vol", 5.1173),
]


@pytest.mark.parametrize("mode", ["exact", "fast"])
def test_golden_labels_and_scores(mode, exact_scorer, fast_scorer):
    sc = exact_scorer if mode == "exact" else fast_scorer
    for text, (elang, escore) in zip(GOLDEN_SENTS, GOLDEN_LABELS):
        lang, score = sc.identify(text)
        assert lang == elang, f"{text[:40]!r}: {lang} != {elang}"
        assert f"{score:.4f}" == f"{escore:.4f}", (
            f"{text[:40]!r}: {score:.4f} != {escore:.4f}"
        )


@pytest.mark.parametrize("mode", ["exact", "fast"])
def test_confidence_off_quirk(mode, exact_scorer, fast_scorer):
    sc = exact_scorer if mode == "exact" else fast_scorer
    lang, _ = sc.identify("hello", ignore_confidence=True)
    assert lang == "sah"


def test_acion_posting_golden():
    m = get_model()
    ot = m.orders[5]  # quingram
    j = int(ot.lookup(hash_grams(["ación"]))[0])
    assert j >= 0
    s, e = int(ot.offsets[j]), int(ot.offsets[j + 1])
    got = [
        (LANGS[l], round(float(p), 4))
        for l, p in zip(ot.plang[s:e], ot.pprob[s:e])
    ]
    assert got == ACION_EXPECTED


def test_empty_and_nonalpha_fallback(fast_scorer):
    # identifier.rs:309-315: no words after preprocessing → (zxx, 7.0)
    for text in ["", "   ", "!!! 123 ???", "\x00\x01"]:
        lang, score = fast_scorer.identify(text)
        assert (lang, score) == ("zxx", 7.0)


def test_topk_contains_winner(fast_scorer):
    top = fast_scorer.identify_topk("Hola, ¿qué tal?", 5)
    assert top[0][0] == "spa"
    assert len(top) == 5
    scores = [s for _, s in top]
    assert scores == sorted(scores)
    # topk on empty → [(zxx, 7.0)] (identifier.rs:322-328)
    assert fast_scorer.identify_topk("", 3) == [("zxx", 7.0)]


def test_cjk_mass_penalty(fast_scorer):
    # >50% CJK chars → only jpn/kor/cmn/cdo can win (identifier.rs:291-298)
    lang, _ = fast_scorer.identify("而目前各方都在追问到底谁应该为这场大疫情")
    assert lang in ("cmn", "jpn", "kor", "cdo")


def test_collapse_macrolang(fast_scorer):
    from heliport_spark.langs import collapse

    assert collapse("finx") == "fin"
    assert collapse("hbsbos") == "hbs"
    assert collapse("undhtml") == "und"
    assert collapse("eng") == "eng"
