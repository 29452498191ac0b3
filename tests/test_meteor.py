"""METEOR: jar stdio protocol (against a scripted fake jar) and the
MeteorLite fallback (Porter stemmer + METEOR-1.5 parameterization)."""
import os
import sys

import numpy as np
import pytest

from spacap3d_tpu.eval.capeval import Meteor, MeteorJar, MeteorLite, porter_stem

FAKE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "fake_meteor_jar.py")


def test_meteor_jar_stdio_protocol():
    """Exercises the exact write/read pairing of the jar wrapper
    (reference lib/capeval/meteor/meteor.py:15-58) without the
    non-redistributable jar."""
    jar = MeteorJar("unused.jar", command=[sys.executable, FAKE])
    gts = {
        "a|1|x": ["sos one two eos", "sos one eos"],     # 2 refs
        "b|2|y": ["sos three eos"],                      # 1 ref
        "c|3|z": ["sos four five six eos", "sos four eos", "sos six eos"],
    }
    res = {
        "a|1|x": ["sos one two eos"],     # 4 hyp tokens -> 2 + 0.04
        "b|2|y": ["sos three four eos"],  # 4 tokens     -> 1 + 0.04
        "c|3|z": ["sos four eos"],        # 3 tokens     -> 3 + 0.03
    }
    final, scores = jar.compute_score(gts, res)
    np.testing.assert_allclose(scores, [2.04, 1.04, 3.03], atol=1e-9)
    assert final == pytest.approx(2.04 + 1.04 + 3.03)
    jar.proc.kill()


def test_meteor_jar_scrubs_separator():
    """Hyps containing the ||| protocol separator must be scrubbed."""
    jar = MeteorJar("unused.jar", command=[sys.executable, FAKE])
    final, scores = jar.compute_score(
        {"k": ["sos a eos"]}, {"k": ["sos a ||| b eos"]}
    )
    # "|||" removed, double-space collapsed -> "sos a b eos" = 4 tokens
    assert scores[0] == pytest.approx(1.04)
    jar.proc.kill()


def test_meteor_dispatch_uses_lite_without_jar(tmp_path):
    m = Meteor(jar_path=str(tmp_path / "missing.jar"))
    assert not m.is_exact
    assert isinstance(m._impl, MeteorLite)


# Porter's own example vocabulary (from the 1980 paper / reference impl)
PORTER_CASES = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("valenci", "valenc"), ("hesitanci", "hesit"),
    ("digitizer", "digit"), ("conformabli", "conform"),
    ("radicalli", "radic"), ("differentli", "differ"), ("vileli", "vile"),
    ("analogousli", "analog"), ("vietnamization", "vietnam"),
    ("predication", "predic"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"),
    ("formaliti", "formal"), ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"), ("formative", "form"),
    ("formalize", "formal"), ("electriciti", "electr"),
    ("electrical", "electr"), ("hopeful", "hope"), ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("homologou", "homolog"),
    ("communism", "commun"), ("activate", "activ"),
    ("angulariti", "angular"), ("homologous", "homolog"),
    ("effective", "effect"), ("bowdlerize", "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
]


@pytest.mark.parametrize("word,stem", PORTER_CASES)
def test_porter_stemmer(word, stem):
    assert porter_stem(word) == stem


def test_meteor_lite_parameters():
    """Penalty must use the declared beta exponent (METEOR-1.5
    Pen = gamma * frag^beta), and a perfect single-chunk match must score
    fmean * (1 - gamma * (1/m)^beta)."""
    lite = MeteorLite()
    hyp = "sos the red chair eos"
    score = lite.sentence_score(hyp, [hyp])
    m = 5
    pen = lite.gamma * (1.0 / m) ** lite.beta
    assert score == pytest.approx(1.0 * (1 - pen))
    # stem matching: "running" vs "runs" -> Porter stems "run"; stem
    # matcher weight 0.6, single content word each side:
    # P = R = 0.6, Fmean = 0.6, Pen = gamma * 1^beta = 0.6
    s = lite.sentence_score("running", ["runs"])
    assert s == pytest.approx(0.6 * (1 - 0.6))


def _meteor_2005():
    """The original METEOR configuration (Banerjee & Lavie 2005):
    Fmean = 10PR/(R+9P) -> alpha=0.9; Pen = 0.5*(ch/m)^3 -> gamma=0.5,
    beta=3; no content/function distinction (delta=0.5 makes the
    weighting collapse to plain counts) and full-weight stems."""
    return MeteorLite(alpha=0.9, beta=3.0, gamma=0.5, delta=0.5,
                      w_exact=1.0, w_stem=1.0)


def test_meteor_2005_paper_reordering_example():
    """The paper's classic word-order example: all 6 words match, and the
    chunk-minimizing alignment yields 3 chunks ("on the mat" / "sat" /
    "the cat"), NOT the 6 chunks a greedy left-to-right first-match
    alignment produces. P=R=1 -> Fmean=1; Pen=0.5*(3/6)^3=0.0625."""
    m = _meteor_2005()
    s = m.sentence_score("on the mat sat the cat",
                         ["the cat sat on the mat"])
    assert s == pytest.approx(1.0 * (1 - 0.5 * (3 / 6) ** 3))


def test_meteor_2005_paper_insertion_example():
    """ref 'the president spoke to the audience', hyp adds 'then':
    m=6, P=6/7, R=1, chunks=2 ('the president' + 'spoke to the
    audience'). Fmean=10PR/(R+9P)=60/61, Pen=0.5*(2/6)^3."""
    m = _meteor_2005()
    s = m.sentence_score("the president then spoke to the audience",
                         ["the president spoke to the audience"])
    fmean = (60 / 7) / (61 / 7)
    pen = 0.5 * (2 / 6) ** 3
    assert s == pytest.approx(fmean * (1 - pen))


def test_meteor_15_delta_weighting():
    """METEOR-1.5 content/function weighting: hyp 'a red chair' vs ref
    'a big chair' — exact matches 'a' (function, weight 1-delta=0.25)
    and 'chair' (content, delta=0.75): wsum=1.0 each side over
    denominator 0.75*2+0.25*1=1.75; 2 chunks over 2 matches ->
    Pen=gamma=0.6."""
    lite = MeteorLite()
    s = lite.sentence_score("a red chair", ["a big chair"])
    p = 1.0 / 1.75
    assert s == pytest.approx(p * (1 - 0.6))


def test_meteor_lite_picks_best_reference():
    lite = MeteorLite()
    refs = ["completely unrelated words here", "sos the red chair eos"]
    both = lite.sentence_score("sos the red chair eos", refs)
    only = lite.sentence_score("sos the red chair eos", [refs[1]])
    assert both == pytest.approx(only)


# ---------------------------------------------------------------------------
# WordNet synonym stage (gated on a locatable WordNet dictionary)
# ---------------------------------------------------------------------------

def _fake_wordnet(tmp_path):
    """A minimal WordNet-format dictionary: sofa/couch share a noun
    synset; runs/run share one (to test stage precedence vs stem)."""
    wn = tmp_path / "wordnet"
    wn.mkdir()
    (wn / "index.noun").write_text(
        "  1 This is a license header line and must be skipped\n"
        "sofa n 1 1 @ 1 0 04256520\n"
        "couch n 2 1 @ 2 0 04256520 00001234\n"
        "chair n 1 1 @ 1 0 03001627\n"
    )
    (wn / "index.verb").write_text(
        "runs v 1 1 @ 1 0 01926311\n"
        "run v 1 1 @ 1 0 01926311\n"
    )
    return str(wn)


def test_meteor_lite_synonym_stage(tmp_path):
    wn = _fake_wordnet(tmp_path)
    lite = MeteorLite(wordnet_dir=wn)
    assert lite.has_synonyms
    off = MeteorLite(wordnet_dir="")          # stage disabled
    assert not off.has_synonyms

    gts = {"k": ["the couch"]}
    res = {"k": ["the sofa"]}
    # with synonyms: 'the' exact (function, 1.0*(1-d)) + sofa~couch
    # synonym (content, 0.8*d): P=R=0.85, fmean=0.85,
    # pen=0.6*(1/2)^0.2 -> score = 0.85*(1-pen)
    with_syn = lite.compute_score(gts, res)[0]
    pen = 0.6 * 0.5 ** 0.2
    assert with_syn == pytest.approx(0.85 * (1 - pen), rel=1e-12)
    # without: only 'the' matches -> P=R=0.25, pen=0.6 -> 0.1
    assert off.compute_score(gts, res)[0] == pytest.approx(0.1, rel=1e-12)
    # unrelated synsets do not match
    assert lite.compute_score({"k": ["chair"]}, {"k": ["sofa"]})[0] == 0.0


def test_meteor_lite_synonym_stage_precedence(tmp_path):
    """A pair matched by BOTH stem and synonym takes the earlier (stem)
    module's weight, like the jar's staged aligner."""
    wn = _fake_wordnet(tmp_path)
    lite = MeteorLite(wordnet_dir=wn)
    score = lite.compute_score({"k": ["run"]}, {"k": ["runs"]})[0]
    # single content word, stem weight 0.6: P=R=0.6, chunks/m=1, pen=0.6
    assert score == pytest.approx(0.6 * (1 - 0.6), rel=1e-12)


def test_meteor_lite_wordnet_autolocate_env(tmp_path, monkeypatch):
    wn = _fake_wordnet(tmp_path)
    monkeypatch.setenv("SPACAP_WORDNET_DIR", wn)
    lite = MeteorLite()
    assert lite.has_synonyms
    assert lite.compute_score({"k": ["sofa"]}, {"k": ["couch"]})[0] > 0
