"""heliport_spark — PySpark-native HeLI language-ID + quality-filter engine.

A from-scratch reimplementation of the capabilities of ZJaume/heliport
(reference at /root/reference, Rust) as the langid core of a Spark
quality-filter pipeline (langid + perplexity + heuristic rules +
PII/toxicity scrub) over audio-clip + transcript tables.

Local (driver-side) API mirrors the reference's Python bindings
(``/root/reference/src/python.rs:92-178``): ``Identifier`` with
``identify``, ``identify_with_score``, ``identify_topk``,
``identify_topk_with_score``, ``par_identify``, ``par_identify_with_score``,
``get_confidence``, ``get_confidence_all``.

Distributed API: ``heliport_spark.operators.identify.identify_df`` and
``heliport_spark.pipeline.quality_filter`` (DataFrame → DataFrame).
"""

from __future__ import annotations

from .heli import Scorer
from .langs import LANGS, collapse
from .model import DEFAULT_MODEL_DIR, HeliModel, get_model

__version__ = "0.1.0"


class Identifier:
    """Driver-side identifier; model is a process-wide singleton
    (mirrors python.rs:68-87)."""

    def __init__(self, model_dir=DEFAULT_MODEL_DIR, exact: bool = False):
        self._scorer = Scorer(get_model(model_dir), exact=exact)

    def identify(self, text: str, ignore_confidence: bool = False) -> str:
        return self._scorer.identify(text, ignore_confidence)[0]

    def identify_with_score(self, text: str, ignore_confidence: bool = False):
        return self._scorer.identify(text, ignore_confidence)

    def identify_topk(self, text: str, k: int):
        return [l for l, _ in self._scorer.identify_topk(text, k)]

    def identify_topk_with_score(self, text: str, k: int):
        return self._scorer.identify_topk(text, k)

    def par_identify(self, texts, ignore_confidence: bool = False):
        labels, _, _, _ = self._scorer.identify_batch(texts, ignore_confidence)
        return [str(l) for l in labels]

    def par_identify_with_score(self, texts, ignore_confidence: bool = False):
        labels, scores, _, _ = self._scorer.identify_batch(texts, ignore_confidence)
        return [(str(l), float(s)) for l, s in zip(labels, scores)]

    def get_confidence(self, lang: str) -> float:
        from .langs import LANG_INDEX

        return float(self._scorer.model.confidence[LANG_INDEX[lang]])

    def get_confidence_all(self) -> dict:
        conf = self._scorer.model.confidence
        return {l: float(conf[i]) for i, l in enumerate(LANGS)}


__all__ = [
    "Identifier",
    "Scorer",
    "HeliModel",
    "get_model",
    "collapse",
    "LANGS",
    "DEFAULT_MODEL_DIR",
]
