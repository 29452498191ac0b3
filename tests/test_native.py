"""Native host-kernel tests: parity with the numpy implementations."""
import numpy as np
import pytest

from spacap3d_tpu.data import native
from spacap3d_tpu.data.dataset import compute_votes
from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig

pytestmark = pytest.mark.skipif(not native.has_native(),
                                reason="native lib unavailable")


def test_gather_rows(rng):
    src = rng.randn(100, 7)
    idx = rng.randint(0, 100, 40).astype(np.int64)
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])
    src32 = src.astype(np.float32)
    np.testing.assert_array_equal(native.gather_rows(src32, idx), src32[idx])


def test_percentile_matches_numpy(rng):
    v = rng.randn(5001)
    for q in (0.99, 50.0, 99.0):
        np.testing.assert_allclose(
            native.percentile_z(v, q), np.percentile(v, q), rtol=1e-12
        )


def test_compute_votes_matches_numpy(rng):
    dc = ScannetDatasetConfig()
    n = 1000
    xyz = rng.randn(n, 3)
    ins = rng.randint(0, 7, n)
    sem = np.where(ins % 2 == 0, 4, 1)
    want_votes, want_mask = compute_votes(xyz, ins, sem, dc)
    got = native.compute_votes_native(xyz, ins, sem, dc.nyu40ids)
    assert got is not None
    votes, mask = got
    np.testing.assert_allclose(votes, want_votes, atol=1e-12)
    np.testing.assert_array_equal(mask, want_mask)


def test_points_in_boxes(rng):
    pc = rng.rand(500, 3).astype(np.float32) * 4
    lo = np.array([[0.0, 0.0, 0.0], [3.0, 3.0, 3.0]])
    hi = np.array([[1.0, 1.0, 1.0], [4.0, 4.0, 4.0]])
    counts = native.points_in_boxes_native(pc, lo, hi)
    want = [
        (((pc >= l) & (pc <= h)).all(-1)).sum() for l, h in zip(lo, hi)
    ]
    np.testing.assert_array_equal(counts, want)


def test_native_greedy_nms_matches_numpy():
    """The C++ greedy NMS (the primary path in detection._greedy_nms) must
    make identical decisions to the numpy matrix fallback across random
    dense box sets, class-blind and class-aware, with and without the
    union epsilon."""
    import spacap3d_tpu.eval.detection as det
    from spacap3d_tpu.data import native as dn

    if dn._load() is None:
        import pytest
        pytest.skip("native library unavailable")

    orig = dn.greedy_nms_native
    r = np.random.RandomState(0)
    try:
        for trial in range(25):
            k = r.randint(3, 260)
            centers = r.rand(k, 3) * 3
            sizes = 0.3 + r.rand(k, 3) * 2
            lo = (centers - sizes / 2).astype(np.float32)
            hi = (centers + sizes / 2).astype(np.float32)
            score = r.rand(k).astype(np.float32)
            cls = r.randint(0, 4, k).astype(np.float64)
            for use_cls, eps in ((None, 0.0), (cls, 1e-8)):
                a = det._greedy_nms(lo, hi, score, 0.25, cls=use_cls,
                                    union_eps=eps)
                dn.greedy_nms_native = lambda *args: None  # force numpy
                b = det._greedy_nms(lo, hi, score, 0.25, cls=use_cls,
                                    union_eps=eps)
                dn.greedy_nms_native = orig
                assert a == b, (trial, use_cls is not None)
    finally:
        dn.greedy_nms_native = orig


def test_native_choice_noreplace_bit_exact_and_stream_continuation():
    """choice_noreplace_native must equal RandomState.choice(n, k,
    replace=False) bit-for-bit (same Fisher-Yates draws from the same
    MT19937 stream, incl. the rejection loop), AND leave the RandomState
    advanced identically — later draws of any kind must match a numpy-
    only twin. Covers fresh and mid-block states, block regeneration
    (n > 624 draws), and the power-of-two mask edges."""
    from spacap3d_tpu.data import native as dn

    if dn._load() is None:
        import pytest
        pytest.skip("native library unavailable")

    for seed in (0, 1, 42, 2**31 - 1, 987654321):
        for n, k in ((50000, 40000), (40001, 40000), (1, 1), (5, 3),
                     (256, 256), (257, 10), (700, 700), (2000, 1)):
            r_np = np.random.RandomState(seed)
            r_nat = np.random.RandomState(seed)
            burn = seed % 701
            r_np.random_sample(burn)
            r_nat.random_sample(burn)
            a = r_np.choice(n, k, replace=False)
            b = dn.choice_noreplace_native(n, k, r_nat)
            np.testing.assert_array_equal(a, b)
            np.testing.assert_array_equal(r_np.random_sample(7),
                                          r_nat.random_sample(7))
            np.testing.assert_array_equal(r_np.randint(0, 999, 5),
                                          r_nat.randint(0, 999, 5))


def test_random_sampling_uses_native_and_matches_numpy():
    """dataset.random_sampling routes through the native kernel and is
    bit-identical to the pure-numpy expression of the reference's
    utils/pc_utils.py:32-40 (both replace modes)."""
    from spacap3d_tpu.data.dataset import random_sampling

    r1, r2 = np.random.RandomState(9), np.random.RandomState(9)
    a = random_sampling(5000, 4000, r1)
    b = r2.choice(5000, 4000, replace=False)
    np.testing.assert_array_equal(a, b)
    # replace=True fallback (fewer points than samples)
    a = random_sampling(100, 128, r1)
    b = r2.choice(100, 128, replace=True)
    np.testing.assert_array_equal(a, b)
