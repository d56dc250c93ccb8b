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


@settings(max_examples=60, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=8))
def test_word_nll_bounded_and_batch_invariant(texts):
    """The independent word-LM signal on arbitrary unicode: finite, within
    [0, PENALTY] (a mean of per-word values each ≤ 7.0), PENALTY exactly
    for token-less rows, and identical whether a text is scored in a batch
    of duplicates or alone (the factorize shortcut + tok cache must not
    change values)."""
    res = _FAST.identify_batch(texts, with_word_nll=True)
    wnll = res[4]
    assert np.all(np.isfinite(wnll))
    assert np.all((wnll >= 0.0) & (wnll <= 7.0 + 1e-6))
    for t, w in zip(texts, wnll):
        solo = _FAST.identify_batch([t], with_word_nll=True)[4][0]
        assert solo == w
    # duplicate-heavy batch (engages the factorize scatter) agrees too
    dup = _FAST.identify_batch(list(texts) * 5, with_word_nll=True)[4]
    assert np.array_equal(dup[: len(texts)], wnll)


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=200))
def test_preprocess_tokens_contain_no_spaces(text):
    toks, cjk_pct = _FAST.preprocess(text)
    assert 0.0 <= cjk_pct <= 1.0
    for t in toks:
        assert t and " " not in t


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=12).filter(lambda s: "\x00" not in s),
                min_size=1, max_size=20))
def test_span_hash_equals_string_hash(grams):
    """The codepoint-span hash the fast path uses MUST be identical to
    hash_grams over the same strings (it doubles as the model key)."""
    import numpy as np

    from heliport_spark.heli import _hash_spans

    joined = "\x00".join(grams)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4")
    lens = np.array([len(g) for g in grams], dtype=np.int64)
    starts = np.zeros(len(grams), dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=starts[1:])
    got = _hash_spans(cp, starts, lens)
    want = hash_grams(grams)
    assert got.tolist() == want.tolist()


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=8).filter(lambda s: "\x00" not in s),
                min_size=1, max_size=6))
def test_window_hash_equals_shingle_hash(words):
    """Cascade window hashes out of the padded codepoint buffer must equal
    hash_grams of the equivalent string shingles for every order 1..6.
    (NUL is excluded: hash_grams' U-array length detection treats it as a
    terminator, and preprocessing can never emit it — not in the keep set.)"""
    import numpy as np

    from heliport_spark.heli import _hash_windows, _shingles

    for t in range(1, 7):
        for w in words:
            ws = f" {w} "
            sh = _shingles(ws, t)
            if not sh:
                continue
            buf = np.frombuffer(ws.encode("utf-32-le"), dtype="<u4")
            wstart = np.arange(len(ws) - t + 1, dtype=np.int64)
            got = _hash_windows(buf, wstart, t)
            want = hash_grams(sh)
            assert got.tolist() == want.tolist()


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-5, max_value=500_000),
    st.integers(min_value=1, max_value=100_000),
    st.integers(min_value=0, max_value=50_000),
)
def test_chunk_bounds_cover_exactly(n, win, min_tail):
    from heliport_spark.functions.audio import chunk_bounds

    bounds = chunk_bounds(n, win, min_tail)
    if n <= 0:
        assert bounds == []
        return
    # exact disjoint cover of [0, n)
    assert bounds[0][0] == 0 and bounds[-1][1] == n
    for (a0, a1), (b0, b1) in zip(bounds, bounds[1:]):
        assert a1 == b0 and a0 < a1
    # every chunk except the last is exactly win; the last absorbs any
    # sub-min_tail sliver
    for s0, e0 in bounds[:-1]:
        assert e0 - s0 == max(1, win)
    if len(bounds) > 1:
        assert bounds[-1][1] - bounds[-1][0] >= min(min_tail, max(1, win))


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1.0, max_value=0.99609375, allow_nan=False, width=32),
        min_size=1, max_size=400,
    ),
    st.sampled_from([8000, 16000, 22050, 44100]),
)
def test_wav_roundtrip_property(samples, sr):
    """encode_wav∘decode_wav is the identity on already-quantized PCM for
    any waveform/sample-rate (the WAV parser is a real RIFF chunk walk)."""
    from heliport_spark.functions.audio import (
        decode_pcm_s16le,
        decode_wav,
        encode_pcm_s16le,
        encode_wav,
    )

    w = decode_pcm_s16le(encode_pcm_s16le(np.asarray(samples, np.float32)))
    w2, sr2, ch = decode_wav(encode_wav(w, sr))
    assert sr2 == sr and ch == 1
    np.testing.assert_array_equal(w, w2)


def _naive_winnow(text, k=5, w=4):
    """From-scratch MOSS winnowing (same rules as dedup.winnow_fingerprints,
    which tests/test_functions.py pins Spark-equal on fixtures): returns the
    selected {(pos, hash)} set."""
    import hashlib
    import re

    norm = re.sub(r"\s+", " ", text.strip()).lower()
    ng = max(len(norm) - (k - 1), 1)
    keyed = [
        (i, int(hashlib.md5(norm[i - 1:i - 1 + k].encode()).hexdigest()[:10], 16))
        for i in range(1, ng + 1)
    ]
    pos_max = (1 << 20) - 1
    out = set()
    for end in range(len(keyed)):
        if not (end + 1 >= w or end + 1 == ng):
            continue
        window = keyed[max(0, end - (w - 1)):end + 1]
        out.add(min(window, key=lambda t: (t[1] << 20) + (pos_max - t[0])))
    return out


@settings(max_examples=80, deadline=None)
@given(
    st.text(alphabet="abcdefgh ", min_size=0, max_size=80),
    st.text(alphabet="abcdefgh ", min_size=0, max_size=80),
    st.text(alphabet="nopqrstuv", min_size=8, max_size=20),
)
def test_winnow_shared_substring_guarantee(prefix_a, prefix_b, shared):
    """THE winnowing guarantee (Schleimer et al. §3): any substring of
    length ≥ w + k − 1 = 8 chars common to two documents contributes at
    least one selected fingerprint VALUE to both — for arbitrary
    surrounding context (disjoint alphabets keep the plant intact under
    normalization)."""
    fa = {h for _, h in _naive_winnow(prefix_a + shared)}
    fb = {h for _, h in _naive_winnow(prefix_b + shared)}
    assert fa & fb


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.booleans(), min_size=0, max_size=60),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=0, max_value=4),
)
def test_speech_segments_invariants(mask, min_speech, max_gap):
    """VAD merge invariants: segments sorted, disjoint, in range, start/end
    on speech frames, length ≥ min_speech, separated by silent gaps longer
    than max_gap, and together they cover every speech frame belonging to a
    qualifying bridged run (checked against an independent scan)."""
    from heliport_spark.functions.audio import speech_segments

    segs = speech_segments(np.array(mask, dtype=bool), min_speech, max_gap)
    prev_end = None
    for s, e in segs:
        assert 0 <= s < e <= len(mask)
        assert mask[s] and mask[e - 1]
        assert e - s >= min_speech
        if prev_end is not None:
            assert s - prev_end > max_gap
        prev_end = e

    # independent reference: bridge runs left-to-right, then length-filter
    runs, cur = [], None
    for i, m in enumerate(mask):
        if m:
            if cur is None:
                cur = [i, i + 1]
            elif i - cur[1] <= max_gap:
                cur[1] = i + 1
            else:
                runs.append(tuple(cur))
                cur = [i, i + 1]
    if cur is not None:
        runs.append(tuple(cur))
    assert segs == [r for r in runs if r[1] - r[0] >= min_speech]
