"""Fused decode kernels (ops/decode_pallas.py): exactness in interpret
mode on CPU, plus the captioner gating (the kernels never engage off-TPU
or in f32 decode, so enabling the flag is a no-op here)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from spacap3d_tpu.ops import decode_pallas as dp


@pytest.mark.parametrize("n,vocab", [(64, 300), (128, 1030)])
def test_generator_argmax_matches_xla(n, vocab):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, 32).astype(np.float32)).astype(jnp.bfloat16)
    gen = {
        "kernel": jnp.asarray(rng.randn(32, vocab).astype(np.float32) * 0.1
                              ).astype(jnp.bfloat16),
        "bias": jnp.asarray(rng.randn(vocab).astype(np.float32) * 0.1
                            ).astype(jnp.bfloat16),
    }
    wp, bp, v = dp.pad_generator(gen, vocab, v_tile=512)
    assert v == vocab and wp.shape[1] % 512 == 0
    with pltpu.force_tpu_interpret_mode():
        idx = jax.jit(lambda x: dp.generator_argmax(x, wp, bp, v))(x)
    logits = jnp.dot(x, gen["kernel"],
                     preferred_element_type=jnp.float32) + gen["bias"]
    want = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want))
    assert int(idx.max()) < vocab  # padded columns can never win


def test_generator_argmax_tie_takes_first():
    # two identical columns -> the lower index must win (jnp.argmax rule)
    x = jnp.ones((8, 8), jnp.bfloat16)
    w = np.zeros((8, 16), np.float32)
    w[:, 3] = 1.0
    w[:, 11] = 1.0
    gen = {"kernel": jnp.asarray(w).astype(jnp.bfloat16),
           "bias": jnp.zeros((16,), jnp.bfloat16)}
    wp, bp, v = dp.pad_generator(gen, 16, v_tile=8)  # ties across two tiles
    with pltpu.force_tpu_interpret_mode():
        idx = dp.generator_argmax(x, wp, bp, v, v_tile=8)
    assert np.asarray(idx).tolist() == [3] * 8


@pytest.mark.parametrize("n", [32, 1024])  # single-block and gridded paths
def test_ffn_matches_xla(n):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(n, 32).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(32, 64).astype(np.float32) * 0.2).astype(jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.2).astype(jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(64, 32).astype(np.float32) * 0.2).astype(jnp.bfloat16)
    b2 = jnp.asarray(rng.randn(32).astype(np.float32) * 0.2).astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(lambda x: dp.ffn(x, w1, b1, w2, b2))(x)
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
    h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
    want = (jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
            ).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_captioner_flag_is_noop_off_tpu():
    """eval_decode_fused=True must not change tokens on a CPU backend
    (the gating keeps the XLA path — jax.default_backend() != 'tpu')."""
    from spacap3d_tpu.config import ModelConfig
    from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
    from spacap3d_tpu.models import init_spacap
    from spacap3d_tpu.models.captioner import captioner_eval

    cfg = ModelConfig(
        num_points=1024, num_proposals=8, num_layers=2, num_heads=4,
        d_model=32, d_ff=64, max_des_len=7, vocab_size=64,
        sa_npoints=(128, 64, 32, 16), sa_nsamples=(16, 8, 8, 4),
        sa_widths=((16, 16, 32), (32, 32, 64), (32, 32, 64), (32, 32, 64)),
        fp_width=64, seed_feature_dim=64, proposal_feature_dim=32,
    )
    rng = np.random.RandomState(2)
    params, state = init_spacap(
        jax.random.PRNGKey(0), cfg,
        ScannetDatasetConfig().mean_size_arr)
    b, k = 2, cfg.num_proposals
    ep = {
        "aggregated_vote_features": jnp.asarray(
            rng.randn(b, k, cfg.d_model).astype(np.float32)),
        "aggregated_vote_xyz": jnp.asarray(
            rng.randn(b, k, 3).astype(np.float32)),
        "bbox_mask": jnp.ones((b, k), jnp.int32),
        "bbox_center": jnp.asarray(rng.randn(b, k, 3).astype(np.float32)),
    }
    t_off = captioner_eval(params["caption"], state["caption"],
                           dataclasses.replace(cfg, eval_decode_fused=False),
                           ep)["lang_cap"]
    t_on = captioner_eval(params["caption"], state["caption"],
                          dataclasses.replace(cfg, eval_decode_fused=True),
                          ep)["lang_cap"]
    np.testing.assert_array_equal(np.asarray(t_on), np.asarray(t_off))
