"""Scorer-internal invariants: fast ≡ exact, memo behavior, hashing."""

import numpy as np

from heliport_spark.heli import Scorer
from heliport_spark.model import hash_grams
from heliport_spark.sources.clips import ADVERSARIAL_SENTS, GOLDEN_SENTS


def _mixed_corpus():
    texts = list(GOLDEN_SENTS) + list(ADVERSARIAL_SENTS)
    # perturbations: word swaps and truncations (deterministic)
    rng = np.random.default_rng(7)
    for s in GOLDEN_SENTS:
        words = s.split()
        if len(words) > 3:
            texts.append(" ".join(rng.permutation(words)))
            texts.append(" ".join(words[: max(1, len(words) // 2)]))
    return texts


def test_fast_matches_exact_labels(exact_scorer, fast_scorer):
    texts = _mixed_corpus()
    le, se, re_, _ = exact_scorer.identify_batch(texts)
    lf, sf, rf, _ = fast_scorer.identify_batch(texts)
    assert list(le) == list(lf)
    # scores agree to 4 decimals (the reference's own precision bar)
    np.testing.assert_allclose(se, sf, atol=5e-5)


def test_batch_matches_single(fast_scorer):
    texts = _mixed_corpus()[:10]
    labels, scores, _, _ = fast_scorer.identify_batch(texts)
    for t, l, s in zip(texts, labels, scores):
        l1, s1 = fast_scorer.identify(t)
        assert l1 == l
        assert abs(s1 - s) < 1e-6


def test_memo_stable_across_batches(fast_scorer):
    t = "Hola, ¿qué tal?"
    l1, s1 = fast_scorer.identify(t)
    for _ in range(3):
        l2, s2 = fast_scorer.identify(t)
        assert (l2, s2) == (l1, s1)


def test_hash_padding_independence():
    # same gram must hash identically regardless of batch max-width padding
    h1 = hash_grams(["ab", "xylophone"])
    h2 = hash_grams(["ab"])
    h3 = hash_grams(np.array(["ab", "a" * 50]))
    assert h1[0] == h2[0] == h3[0]
    assert len({int(h) for h in hash_grams(["a", "b", "ab", "ba", "aa"])}) == 5


def test_preprocess_cjk_split(fast_scorer):
    toks, cjk_pct = fast_scorer.preprocess("abc你好def")
    assert toks == ["abc", "你好", "def"]
    assert 0.2 < cjk_pct < 0.4  # 2 of 9 non-space chars... 2/9
    toks2, _ = fast_scorer.preprocess("Hello,   World!")
    assert toks2 == ["hello", "world"]


def test_ft_cross_check(fast_scorer):
    labels, probs = fast_scorer.ft_identify_batch(
        ["the quick brown fox jumps over the lazy dog", ""]
    )
    assert labels[1] == "zxx" and probs[1] == 0.0
    assert 0.0 <= probs[0] <= 1.0


def test_vocab_bank_reset_preserves_labels(fast_scorer):
    """A tiny cache_cap forces mid-stream bank resets; labels and scores must
    be identical to an unbounded-cache scorer (the reset only costs time)."""
    from heliport_spark.heli import Scorer

    texts = [
        "Hola, ¿qué tal estás hoy?",
        "hello world this is english text",
        "das ist ein deutscher Satz",
        "ceci est une phrase française",
        "questo è un testo italiano",
    ] * 4
    small = Scorer(fast_scorer.model, cache_cap=3)  # reset nearly every batch
    l1, s1, _, _ = small.identify_batch(texts)
    # second pass re-scores everything after resets
    l2, s2, _, _ = small.identify_batch(texts)
    lr, sr, _, _ = fast_scorer.identify_batch(texts)
    assert list(l1) == list(lr) == list(l2)
    assert [float(x) for x in s1] == [float(x) for x in sr]
    # the reset fires at batch start, so the bank never exceeds one batch's
    # distinct-word count (26 here) instead of accumulating across batches
    assert small._vb_n == len({w for t in texts for w in t.lower().split()})


def test_duplicate_texts_identical_results(fast_scorer):
    """The exact-duplicate shortcut (score distinct texts once, scatter back)
    must be bit-identical to scoring every row."""
    base = [
        "Hola, ¿qué tal estás hoy?",
        "hello world this is english text",
        "das ist ein deutscher Satz",
        None,
        "",
    ]
    texts = base * 20  # 100 rows, 5 distinct -> shortcut fires
    from heliport_spark.heli import Scorer

    l1, s1, r1, c1 = fast_scorer.identify_batch(texts)
    # a scorer fed one-row-at-a-time never takes the shortcut
    ref = Scorer(fast_scorer.model)
    for i, t in enumerate(texts):
        l2, s2, r2, c2 = ref.identify_batch([t])
        assert l1[i] == l2[0]
        assert float(s1[i]) == float(s2[0])
        assert float(r1[i]) == float(r2[0])
        assert float(c1[i]) == float(c2[0])


def test_duplicate_shortcut_nul_bytes_not_merged(fast_scorer):
    """pandas 2.x hashes str objects as C strings — everything after an
    embedded NUL is invisible to pd.factorize, so '\\x00A' used to merge
    with '' in the exact-duplicate shortcut and scatter the WRONG rows'
    scores (hypothesis-found, pinned here deterministically). The NUL
    fallback must keep such texts distinct AND stay batch-shape invariant."""
    from heliport_spark.heli import Scorer, _factorize_texts

    import numpy as np

    # the factorize helper itself: NUL texts stay distinct
    codes, uniq = _factorize_texts(["", "\x00A", "A\x00", "A", "\x00"] * 4)
    assert len(uniq) == 5
    assert len(set(codes[:5])) == 5

    base = ["", "", "", "\x00A"]
    big = base * 5  # n > 16 and 2·uniq ≤ n → shortcut fires
    l1, s1, r1, c1, w1 = fast_scorer.identify_batch(big, with_word_nll=True)
    ref = Scorer(fast_scorer.model)
    l0, s0, r0, c0, w0 = ref.identify_batch(base, with_word_nll=True)
    assert list(l1[:4]) == list(l0)
    assert [float(x) for x in s1[:4]] == [float(x) for x in s0]
    assert np.array_equal(w1[:4], w0)


def test_topk_k_zero_empty():
    s = Scorer()
    assert s.identify_topk("hello world", 0) == []
    assert s.identify_topk("hello world", 1) and len(s.identify_topk("hello", 1)) == 1


def test_hash_spans_long_token_matches_hash_grams():
    """Spans > 64 chars go through the compacted long-span loop — must stay
    bit-identical to hash_grams (and not cost O(len × batch))."""
    import numpy as np

    from heliport_spark.heli import _hash_spans
    from heliport_spark.model import hash_grams

    words = ["short", "x" * 65, "y" * 500, "z" * 64, "mid" * 30]
    joined = "\x00".join(words)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4")
    lens = np.array([len(w) for w in words], dtype=np.int64)
    starts = np.zeros(len(words), dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=starts[1:])
    assert _hash_spans(cp, starts, lens).tolist() == hash_grams(words).tolist()


def test_word_nll_dense_gather_matches_sorted_probe(fast_scorer, monkeypatch):
    """word_nll_batch has two bit-identical lookup paths: the dense
    (uniq word × distinct winner) gather and the sorted-key binary-search
    fallback it replaced (engaged above _WNLL_DENSE_CELL_CAP). Pin their
    equality on a mixed batch (known words, OOV, empty, CJK, duplicates)."""
    import heliport_spark.heli as H

    texts = _mixed_corpus() + ["", "zzqqxx unknownword9", "你好世界 " * 4]
    texts = texts * 3  # exercise the duplicate shortcut too
    res_dense = fast_scorer.identify_batch(texts, with_word_nll=True)

    monkeypatch.setattr(H, "_WNLL_DENSE_CELL_CAP", -1)
    fallback_scorer = Scorer()
    res_fb = fallback_scorer.identify_batch(texts, with_word_nll=True)
    assert list(res_dense[0]) == list(res_fb[0])
    np.testing.assert_array_equal(res_dense[4], res_fb[4])


def test_dup_probe_soundness():
    """_dup_probe_rules_out may only return True when the shortcut truly
    cannot fire (2*uniq > n) — never on duplicate-heavy batches."""
    from heliport_spark.heli import _dup_probe_rules_out

    distinct = [f"text number {i}" for i in range(100)]
    assert _dup_probe_rules_out(distinct)          # all unique: ruled out
    dup = [distinct[i % 10] for i in range(100)]
    assert not _dup_probe_rules_out(dup)           # 10 uniques: must probe
    # non-str rows coerce to '' (matching _factorize_texts)
    assert not _dup_probe_rules_out([None] * 50 + distinct[:10])
