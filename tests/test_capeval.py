"""Caption metric tests pinned to the expected values embedded in the
reference scorers' __main__ demos (lib/capeval/bleu/bleu.py:50-75,
rouge/rouge.py:107-111), plus algebraic sanity checks for CIDEr."""
import numpy as np
import pytest

from spacap3d_tpu.eval.capeval import Bleu, Cider, Meteor, MeteorLite, Rouge


def test_bleu_pinned_reference_demo():
    gts = {
        "0": ["sos good eos", "sos jll good good good good eos"],
        "1": ["sos good eos", "sos jll good good good good eos"],
    }
    res = {"0": ["sos eos"], "1": ["sos eos"]}
    score, scores = Bleu(4).compute_score(gts, res)
    # expected corpus scores from the reference __main__ comment
    want = [0.6065306594093685, 1.3562437847075899e-08,
            4.8140370339869904e-08, 9.069748823777882e-08]
    np.testing.assert_allclose(score, want, rtol=1e-9)
    want_per = [0.6065306591061034, 1.9180183530189284e-08,
                6.065306591061037e-08, 1.0785809827805428e-07]
    for k in range(4):
        np.testing.assert_allclose(scores[k], [want_per[k]] * 2, rtol=1e-9)


def test_rouge_pinned_reference_demo():
    hypo = ["sos eos"]
    ref = ["sos jll good good good good  jll good good good good  jll good good good good eos"]
    got = Rouge().calc_score(hypo, ref)
    # independent oracle: lcs=2 ('sos','eos'), prec=1.0, rec=2/19
    # (the reference splits on " " keeping empty tokens from the double
    # spaces: 17 words + 2 empties = 19)
    pmax, rmax, b2 = 1.0, 2.0 / 19.0, 1.2 ** 2
    want = (1 + b2) * pmax * rmax / (rmax + b2 * pmax)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_cider_perfect_match_is_10():
    gts = {str(i): [f"a b c d e unique{i}"] for i in range(4)}
    res = {k: [v[0]] for k, v in gts.items()}
    score, scores = Cider().compute_score(gts, res)
    np.testing.assert_allclose(score, 10.0, rtol=1e-6)
    np.testing.assert_allclose(scores, 10.0, rtol=1e-6)


def test_cider_disjoint_is_0():
    gts = {"0": ["a b c"], "1": ["d e f"]}
    res = {"0": ["x y z"], "1": ["u v w"]}
    score, _ = Cider().compute_score(gts, res)
    np.testing.assert_allclose(score, 0.0, atol=1e-9)


def test_cider_hand_computed_unigram():
    # 2 images; idf: 'a' appears in both ref sets (df=2), 'b'/'c' in one.
    # ref_len = log(2). Image 0: hyp == ref == "a b" → per-n cosine 1 with
    # zero delta penalty, except n-grams where idf=0 make norms 0 → val 0.
    gts = {"0": ["a b"], "1": ["a c"]}
    res = {"0": ["a b"], "1": ["c"]}
    score, scores = Cider(n=2).compute_score(gts, res)
    lg2 = np.log(2.0)
    # image 0: unigram vec hyp=ref: a:0 (idf 0), b:lg2 → cos=1; bigram 'a b'
    # idf=lg2 → cos=1; delta=0 → score = mean([1,1])*10/1 = 10
    np.testing.assert_allclose(scores[0], 10.0, rtol=1e-6)
    # image 1: hyp 'c' matches ref unigram 'c' (idf lg2); ref norm over
    # {a:0, c:lg2}; cos = lg2*lg2/(lg2*lg2)=1; bigram: hyp none → 0.
    # delta = length_hyp - length_ref where "length" counts bigrams: 0 - 1
    pen = np.exp(-1.0 / (2 * 36.0))
    want1 = np.mean([1.0 * pen, 0.0]) * 10
    np.testing.assert_allclose(scores[1], want1, rtol=1e-6)


def test_meteor_fallback_monotonic():
    m = MeteorLite()
    gts = {"0": ["sos a red chair next to the table eos"]}
    good = {"0": ["sos a red chair next to the table eos"]}
    partial = {"0": ["sos a red chair eos"]}
    bad = {"0": ["sos zzz qqq eos"]}
    s_good, _ = m.compute_score(gts, good)
    s_part, _ = m.compute_score(gts, partial)
    s_bad, _ = m.compute_score(gts, bad)
    assert s_good > s_part > s_bad >= 0.0


def test_meteor_dispatch_flags_fallback():
    m = Meteor()
    # jar is absent in this environment -> must flag non-parity fallback
    assert isinstance(m.is_exact, bool)


def test_cider_ref_cache_bit_equal():
    """Cider(refs=CiderRefs(gts)) must produce bit-identical scores to a
    fresh Cider() — the cache only reuses identical intermediate values
    (the mul_eval grid scores the same corpus once per seed). Also: a
    second scoring pass with DIFFERENT candidates through the same cache
    must still match fresh (the cached ref vectors are never mutated)."""
    from spacap3d_tpu.eval.capeval import Cider, CiderRefs

    rng = np.random.RandomState(4)
    words = ["a", "red", "chair", "by", "the", "wall", "big", "sos", "eos"]

    def sent(k):
        return "sos " + " ".join(rng.choice(words, k)) + " eos"

    gts = {f"k{i}": [sent(rng.randint(3, 12)) for _ in range(rng.randint(1, 4))]
           for i in range(60)}
    refs = CiderRefs(gts)
    for trial in range(3):
        res = {k: [sent(rng.randint(2, 12))] for k in gts}
        m_fresh, s_fresh = Cider().compute_score(gts, res)
        m_cached, s_cached = Cider(refs=refs).compute_score(gts, res)
        assert m_fresh == m_cached
        np.testing.assert_array_equal(s_fresh, s_cached)
    # key mismatch falls back to fresh computation (no wrong reuse)
    sub = {k: gts[k] for k in list(gts)[:30]}
    res = {k: [sent(5)] for k in sub}
    m_sub, _ = Cider(refs=refs).compute_score(sub, res)
    m_ref, _ = Cider().compute_score(sub, res)
    assert m_sub == m_ref
