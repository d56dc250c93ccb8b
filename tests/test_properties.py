"""Property-based invariants (hypothesis): the scorer must never crash on
arbitrary unicode, fast and exact modes must agree on labels, and the hash
must be injective-in-practice and padding-independent."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from heliport_spark.heli import Scorer
from heliport_spark.model import hash_grams

_FAST = Scorer()
_EXACT = Scorer(exact=True)

text_strategy = st.text(
    alphabet=st.characters(codec="utf-8"), min_size=0, max_size=300
)


@settings(max_examples=150, deadline=None)
@given(text_strategy)
def test_identify_total_on_arbitrary_unicode(text):
    lang, score = _FAST.identify(text)
    assert isinstance(lang, str) and len(lang) >= 3
    assert np.isfinite(score)


@settings(max_examples=60, deadline=None)
@given(text_strategy)
def test_fast_matches_exact_label(text):
    lf, sf = _FAST.identify(text)
    le, se = _EXACT.identify(text)
    assert lf == le
    assert abs(sf - se) < 5e-4


@settings(max_examples=60, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=8))
def test_batch_consistent_with_singles(texts):
    labels, scores, _, _ = _FAST.identify_batch(texts)
    for t, l in zip(texts, labels):
        assert _FAST.identify(t)[0] == l


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=30))
def test_hash_padding_independent(grams):
    joint = hash_grams(grams)
    for g, h in zip(grams, joint):
        assert int(hash_grams([g])[0]) == int(h)


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=200))
def test_preprocess_tokens_contain_no_spaces(text):
    toks, cjk_pct = _FAST.preprocess(text)
    assert 0.0 <= cjk_pct <= 1.0
    for t in toks:
        assert t and " " not in t
