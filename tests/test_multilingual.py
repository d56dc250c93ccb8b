"""Wide multilingual behavior: sentences sampled from each language's own
top word-model vocabulary must (a) score identically in fast and exact
modes, and (b) overwhelmingly classify as that language (or its macrolang)
with confidence thresholds off.

This extends the 13-sentence golden anchor to ~40 languages × 30 sentences
of realistic per-language text (FIXTURES.md F1 generation recipe).
"""

from pathlib import Path

import numpy as np
import pytest

from heliport_spark.heli import Scorer
from heliport_spark.langs import collapse

MODEL_SRC = Path("/root/reference/LanguageModels")

LANGS_40 = [
    "eng", "spa", "fra", "deu", "ita", "por", "nld", "swe", "dan", "nob",
    "fin", "est", "lav", "lit", "pol", "ces", "slk", "hun", "ron", "bul",
    "rus", "ukr", "ell", "tur", "ara", "heb", "hin", "ben", "tam", "tel",
    "tha", "vie", "kor", "jpn", "swa", "yor", "zul", "eus", "cat", "glg",
]


def _corpus():
    rng = np.random.default_rng(42)
    texts, labels = [], []
    for lang in LANGS_40:
        path = MODEL_SRC / f"{lang}.word.model"
        if not path.exists():
            continue
        with open(path, encoding="utf-8") as fh:
            fh.readline()
            words = [line.split("\t")[0] for _, line in zip(range(400), fh)]
        for _ in range(30):
            n = int(rng.integers(6, 18))
            texts.append(" ".join(rng.choice(words, size=n)))
            labels.append(lang)
    return texts, labels


@pytest.fixture(scope="module")
def corpus():
    return _corpus()


def test_fast_equals_exact_wide(corpus):
    texts, _ = corpus
    fast = Scorer()
    exact = Scorer(exact=True)
    lf, sf, _, _ = fast.identify_batch(texts, ignore_confidence=True)
    le, se, _, _ = exact.identify_batch(texts, ignore_confidence=True)
    mismatches = [
        (t[:40], a, b) for t, a, b in zip(texts, lf, le) if a != b
    ]
    assert len(mismatches) / len(texts) <= 0.001, mismatches[:5]
    np.testing.assert_allclose(sf, se, atol=5e-4)


def test_language_recovery(corpus):
    texts, labels = corpus
    sc = Scorer()
    preds, _, _, _ = sc.identify_batch(texts, ignore_confidence=True)
    ok = sum(
        1 for p, l in zip(preds, labels) if collapse(str(p)) == collapse(l)
    )
    acc = ok / len(labels)
    assert acc >= 0.90, f"language recovery {acc:.3f}"


def test_confidence_reduces_to_und_not_wrong(corpus):
    """With thresholds ON, low-margin predictions become 'und' rather than a
    different wrong language: accuracy among non-und predictions must not
    drop below the thresholds-off accuracy."""
    texts, labels = corpus
    sc = Scorer()
    pred_on, _, _, _ = sc.identify_batch(texts, ignore_confidence=False)
    kept = [(str(p), l) for p, l in zip(pred_on, labels) if p != "und"]
    acc_on = sum(1 for p, l in kept if collapse(p) == collapse(l)) / len(kept)
    assert acc_on >= 0.93, f"non-und accuracy {acc_on:.3f}"


def test_multilingual_documents_model_root_warns(spark, tmp_path):
    """ADVICE r6 #3: a missing/partial word-model root must WARN naming the
    skipped languages (row counts of the supplemented corpus are otherwise
    an undiagnosable environment function), and the root must be
    configurable via argument and $HELIPORT_SPARK_WORD_MODELS."""
    import os
    import warnings as _warnings

    from heliport_spark.sources.multilingual import (
        MODEL_SRC_ENV,
        multilingual_documents,
    )

    empty = tmp_path / "no_models"
    empty.mkdir()
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        out = multilingual_documents(
            spark, langs=("spa", "fin"), model_root=str(empty)
        )
    assert out is None
    msgs = [str(w.message) for w in rec]
    assert any("spa" in m and "fin" in m and str(empty) in m for m in msgs)

    # env-var route points at the same empty dir → same skip-with-warning
    old = os.environ.get(MODEL_SRC_ENV)
    os.environ[MODEL_SRC_ENV] = str(empty)
    try:
        with _warnings.catch_warnings(record=True) as rec2:
            _warnings.simplefilter("always")
            assert multilingual_documents(spark, langs=("spa",)) is None
        assert any("spa" in str(w.message) for w in rec2)
    finally:
        if old is None:
            del os.environ[MODEL_SRC_ENV]
        else:
            os.environ[MODEL_SRC_ENV] = old
