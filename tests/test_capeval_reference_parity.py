"""Metric parity against the ACTUAL reference scorers.

The reference's vendored capeval scorers are pure Python, so we import
them straight from /root/reference (read-only) and compare our
implementations on randomized corpora — bit-level parity for
BLEU-1..4, CIDEr, and ROUGE-L.
"""
import os
import random
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "lib", "capeval")),
    reason="reference capeval not available",
)


def _import_ref():
    sys.path.insert(0, REF)
    try:
        from lib.capeval.bleu.bleu import Bleu as RefBleu
        from lib.capeval.cider.cider import Cider as RefCider
        from lib.capeval.rouge.rouge import Rouge as RefRouge
    finally:
        sys.path.pop(0)
    return RefBleu, RefCider, RefRouge


WORDS = ("the a chair table red brown big small next to left right on "
         "under door window room corner wooden dark this is near far "
         "it desk").split()


def make_corpus(rng: random.Random, n_keys=25, max_refs=3):
    gts, res = {}, {}
    for i in range(n_keys):
        key = f"scene{i:04d}|{i % 7}|obj"
        refs = []
        for _ in range(rng.randint(1, max_refs)):
            n = rng.randint(3, 14)
            refs.append("sos " + " ".join(rng.choice(WORDS) for _ in range(n)) + " eos")
        gts[key] = refs
        if rng.random() < 0.15:
            res[key] = ["sos eos"]  # undetected-object backfill
        else:
            n = rng.randint(2, 12)
            res[key] = ["sos " + " ".join(rng.choice(WORDS) for _ in range(n)) + " eos"]
    return gts, res


def test_bleu_cider_rouge_match_reference_exactly():
    RefBleu, RefCider, RefRouge = _import_ref()
    from spacap3d_tpu.eval.capeval import Bleu, Cider, Rouge

    for seed in (0, 1, 2):
        rng = random.Random(seed)
        gts, res = make_corpus(rng)

        ref_b, ref_bs = RefBleu(4).compute_score(gts, res)
        my_b, my_bs = Bleu(4).compute_score(gts, res)
        np.testing.assert_allclose(my_b, ref_b, rtol=1e-12)
        for k in range(4):
            np.testing.assert_allclose(my_bs[k], ref_bs[k], rtol=1e-12)

        ref_c, ref_cs = RefCider().compute_score(gts, res)
        my_c, my_cs = Cider().compute_score(gts, res)
        np.testing.assert_allclose(my_c, ref_c, rtol=1e-12)
        np.testing.assert_allclose(my_cs, ref_cs, rtol=1e-12)

        ref_r, ref_rs = RefRouge().compute_score(gts, res)
        my_r, my_rs = Rouge().compute_score(gts, res)
        np.testing.assert_allclose(my_r, ref_r, rtol=1e-12)
        np.testing.assert_allclose(my_rs, ref_rs, rtol=1e-12)
