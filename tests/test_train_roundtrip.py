"""End-to-end training round trip (reference: heliport create-model →
binarize → identify; tests/cli.rs + languagemodel.rs:376-418):

synthetic corpora → Spark create-model CLI (T1-T4) → compile-model (S5,
T5-T7) → identify with the freshly trained mini-model.
"""

import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import pytest

ENG = (
    "the quick brown fox jumps over the lazy dog and then runs home "
    "while everyone watches the evening news about weather and sports"
)
SPA = (
    "el rápido zorro marrón salta sobre el perro perezoso y luego corre "
    "a casa mientras todos miran las noticias de la tarde sobre el clima"
)


@pytest.fixture(scope="module")
def trained_model(spark):
    base = Path(tempfile.mkdtemp(prefix="hs_train_"))
    corpus = base / "corpus"
    model_dir = base / "model"
    corpus.mkdir()
    model_dir.mkdir()
    # training corpora: {lang}.train naming like the reference trainer
    (corpus / "eng.train").write_text("\n".join([ENG] * 50))
    (corpus / "spa.train").write_text("\n".join([SPA] * 50))

    from heliport_spark.__main__ import cmd_create_model

    class A:
        output_dir = str(model_dir)
        input_files = [str(corpus / "eng.train"), str(corpus / "spa.train")]
        top_k = 10_000

    assert cmd_create_model(A) == 0
    # model dir metadata the loader expects
    (model_dir / "languagelist").write_text("eng\nspa\n")
    (model_dir / "confidenceThresholds").write_text("eng\t0.1\nspa\t0.1\n")

    from heliport_spark.model_compile import compile_model

    out = compile_model(
        str(model_dir), str(base / "artifact"), langs=["eng", "spa"],
        verbose=False, strict_confidence=False,
    )
    yield out
    shutil.rmtree(base, ignore_errors=True)


def test_created_model_files(trained_model):
    meta = (trained_model / "meta.json").read_text()
    assert '"word"' in meta and '"hexagram"' in meta


def test_identify_with_trained_model(trained_model):
    from heliport_spark.heli import Scorer
    from heliport_spark.model import HeliModel

    sc = Scorer(HeliModel(trained_model))
    assert sc.identify("the quick brown fox", ignore_confidence=True)[0] == "eng"
    assert sc.identify("el zorro marrón salta", ignore_confidence=True)[0] == "spa"
    # unseen-script text: everything penalized equally → falls to later langs,
    # but must not crash
    lang, score = sc.identify("שלום עולם", ignore_confidence=True)
    assert isinstance(lang, str)


def test_trained_counts_match_reference_format(trained_model, spark):
    """The written .model files follow the reference format: total count
    header then tab-separated desc-sorted counts (trainer.rs:105-108)."""
    model_dir = trained_model.parent / "model"
    lines = (model_dir / "eng.word.model").read_text().splitlines()
    total = int(lines[0])
    counts = [int(l.split("\t")[1]) for l in lines[1:]]
    assert total == sum(counts)
    assert counts == sorted(counts, reverse=True)
    # 'the' appears 3x per line: must be the top word
    assert lines[1].split("\t")[0] == "the"
