"""Deep one-off fuzz of the scorer's fast paths against their reference
semantics — heavier than the in-suite property tests (which cap examples
for gate time). Run manually after touching heli.py hot paths:

    python scripts/fuzz_scorer.py [n_examples]

Targets the invariants the round-5 fast lanes rely on:
  * fast ≡ exact (label bit-equal, score within 5e-4) on arbitrary unicode;
  * batch-shape invariance through the exact-duplicate factorize shortcut
    (n > 16, heavy duplication — the regime where the pandas NUL C-string
    bug hid) and through the joined-lowercase fast path (embedded newlines
    force the per-text fallback; case-expanding chars like 'İ' shift
    separator offsets);
  * word_nll batch invariance under the same stress;
  * identify_topk_batch ≡ the per-row reference scan.
Exit code 0 = all invariants held; first counterexample is printed and
re-raised.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from hypothesis import given, settings, strategies as st

from heliport_spark.heli import COLLAPSE, LANGS_ARR, PENALTY, Scorer

_FAST = Scorer()
_EXACT = Scorer(exact=True)

# skew toward the characters that exercise edge paths: NUL (pandas C-string
# hashing), newline (joined fast-path fallback), dotted-I (lowercase grows),
# final sigma (context-dependent lowercase), CJK, combining marks
_edge = st.sampled_from(["\x00", "\n", "İ", "Σς", "ẞ", "日", "あ", "́", "\r"])
_tex = st.text(alphabet=st.characters(codec="utf-8"), min_size=0, max_size=60)
text_strategy = st.one_of(
    _tex,
    st.tuples(_tex, _edge, _tex).map(lambda t: t[0] + t[1] + t[2]),
)


def big_batches():
    """Batches big enough (n > 16) with duplication heavy enough (2·uniq ≤ n)
    to force the factorize shortcut."""
    return st.lists(text_strategy, min_size=2, max_size=12).flatmap(
        lambda base: st.integers(min_value=3, max_value=6).map(
            lambda k: base * k + base[:1] * max(0, 17 - len(base) * k)
        )
    )


def run(n_examples: int) -> None:
    @settings(max_examples=n_examples, deadline=None)
    @given(text_strategy)
    def fast_matches_exact(text):
        lf, sf = _FAST.identify(text)
        le, se = _EXACT.identify(text)
        assert lf == le, (repr(text), lf, le)
        assert abs(sf - se) < 5e-4, (repr(text), sf, se)

    @settings(max_examples=n_examples, deadline=None)
    @given(big_batches())
    def batch_invariant(texts):
        """Fast-path scores are batch-shape invariant WITHIN the documented
        f32 band (CLAUDE.md: < 5e-5): the dense branch is a BLAS sgemm whose
        blocking — and so f32 summation order — depends on the batch's row
        count, so bit-equality across widths is deliberately not promised
        (the dedup shortcut makes equal texts bit-equal WITHIN a batch; the
        exact mode is the bit-stable reference order). Labels may only flip
        when the top-2 margin sits inside that band; word_nll follows the
        pre-collapse winner id, so it is only pinned away from near-ties."""
        tol = 5e-5
        l1, s1, r1, c1, w1 = _FAST.identify_batch(texts, with_word_nll=True)
        ref = Scorer(_FAST.model)
        for i in (0, len(texts) // 2, len(texts) - 1):
            l0, s0, r0, c0, w0 = ref.identify_batch(
                [texts[i]], with_word_nll=True
            )
            assert abs(float(s1[i]) - float(s0[0])) < tol, (
                repr(texts[i]), s1[i], s0[0],
            )
            top2 = ref.identify_topk_batch([texts[i]], 2)[0]
            margin = top2[1][1] - top2[0][1] if len(top2) > 1 else 1.0
            if l1[i] != l0[0]:
                assert margin < tol, (repr(texts[i]), l1[i], l0[0], margin)
            elif margin > 1e-4:
                assert abs(float(w1[i]) - float(w0[0])) < tol, (
                    repr(texts[i]), w1[i], w0[0],
                )

    @settings(max_examples=max(20, n_examples // 4), deadline=None)
    @given(st.lists(text_strategy, min_size=1, max_size=24), st.integers(0, 5))
    def topk_matches_reference_scan(texts, k):
        got = _FAST.identify_topk_batch(texts, k)
        points, valid, _ = _FAST.score_batch(list(texts))
        orders = np.argsort(points, axis=1, kind="stable")
        for r in range(len(points)):
            if not valid[r]:
                assert got[r] == [("zxx", float(PENALTY))]
                continue
            row, seen = [], set()
            for i in orders[r]:
                if len(row) >= k:
                    break
                c = int(COLLAPSE[i])
                if c in seen:
                    continue
                seen.add(c)
                row.append((str(LANGS_ARR[c]), float(points[r][i])))
            assert got[r] == row, (r, texts[r], got[r], row)

    for check in (fast_matches_exact, batch_invariant, topk_matches_reference_scan):
        print(f"fuzz: {check.__name__} x{n_examples} ...", flush=True)
        check()
        print(f"fuzz: {check.__name__} OK", flush=True)


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 1000)
    print("ALL FUZZ INVARIANTS HELD")
