"""Shape / variant smoke tests for the composite model on tiny configs."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spacap3d_tpu.config import ModelConfig
from spacap3d_tpu.models import apply_spacap, init_spacap
from spacap3d_tpu.models.spacap import make_forward

TINY = ModelConfig(
    num_points=256,
    num_proposals=16,
    vocab_size=30,
    num_layers=2,
    num_heads=4,
    d_model=32,
    d_ff=64,
    max_num_obj=8,
    sa_npoints=(64, 32, 16, 8),
    sa_nsamples=(8, 8, 4, 4),
    sa_widths=((16, 16, 32), (32, 32, 64), (32, 32, 64), (32, 32, 64)),
    fp_width=64,
    seed_feature_dim=64,
    proposal_feature_dim=32,
    max_des_len=7,
)


def tiny_batch(rng, cfg: ModelConfig, b=2):
    n = cfg.num_points
    t = cfg.max_des_len + 2
    lang_ids = np.zeros((b, t), np.int64)
    lang_ids[:, 0] = 2  # sos
    lang_ids[:, 1:6] = rng.randint(4, cfg.vocab_size, (b, 5))
    lang_ids[:, 6] = 3  # eos
    batch = {
        "point_clouds": rng.randn(b, n, 3 + cfg.input_feature_dim).astype(np.float32),
        "lang_label": np.concatenate([np.ones((b, 1), np.int64), lang_ids], 1),
        "lang_ids": lang_ids,
        "ref_center_label": rng.randn(b, 3).astype(np.float32),
        "bbox_mask_dummy": np.zeros((b,), np.int64),
    }
    return {k: jnp.asarray(v) for k, v in batch.items()}


def _mean_sizes(cfg):
    return np.abs(np.random.RandomState(1).randn(cfg.num_size_cluster, 3)) + 0.5


@pytest.mark.parametrize(
    "variant",
    [
        dict(),  # flagship: encoder + learned xyz pos + early guide + relation
        dict(use_transformer_encoder=False, src_pos_type=None, early_guide=False,
             check_relation=False),  # base model (--no_enc --late_guide --no_relation)
        dict(early_guide=False, check_relation=False),  # late guide w/ encoder
        dict(src_pos_type="loc"),  # size-decoded src pos
    ],
)
def test_forward_train_and_eval(rng, variant):
    cfg = dataclasses.replace(TINY, **variant)
    params, state = init_spacap(jax.random.PRNGKey(0), cfg, _mean_sizes(cfg))
    batch = tiny_batch(rng, cfg)
    b = batch["point_clouds"].shape[0]

    ep, new_state = make_forward(cfg, is_eval=False, train=True)(
        params, state, batch, jax.random.PRNGKey(1)
    )
    t = cfg.max_des_len + 1
    assert ep["lang_cap"].shape == (b, t, cfg.vocab_size)
    assert ep["center"].shape == (b, cfg.num_proposals, 3)
    assert ep["bbox_corner"].shape == (b, cfg.num_proposals, 8, 3)
    assert ep["objectness_scores"].shape == (b, cfg.num_proposals, 2)
    assert ep["sem_cls_scores"].shape == (b, cfg.num_proposals, cfg.num_class)
    if cfg.check_relation:
        assert ep["relation_pred"].shape == (b, cfg.num_proposals, cfg.num_proposals, 9)
    # log-probs normalize
    np.testing.assert_allclose(
        np.exp(np.asarray(ep["lang_cap"])).sum(-1), 1.0, rtol=5e-4
    )

    ep_eval, _ = make_forward(cfg, is_eval=True, train=False)(params, state, batch)
    assert ep_eval["lang_cap"].shape == (b, cfg.num_proposals, t)
    assert ep_eval["lang_cap"].dtype == jnp.int32


def test_bf16_decode_tokens_match_f32(rng):
    """The bf16 decode loop (default) must produce the same greedy tokens
    as the f32 path: matmuls accumulate in f32 and the argmax runs on f32
    logits, so only exact ties could flip (measure-zero at random init)."""
    cfg32 = dataclasses.replace(TINY, eval_decode_dtype="float32",
                                eval_decode_stages=1)
    params, state = init_spacap(jax.random.PRNGKey(4), cfg32, _mean_sizes(cfg32))
    batch = tiny_batch(rng, cfg32)
    ep32, _ = make_forward(cfg32, is_eval=True, train=False)(params, state, batch)
    cfg16 = dataclasses.replace(TINY, eval_decode_dtype="bfloat16",
                                eval_decode_stages=1)
    ep16, _ = make_forward(cfg16, is_eval=True, train=False)(params, state, batch)
    np.testing.assert_array_equal(
        np.asarray(ep16["lang_cap"]), np.asarray(ep32["lang_cap"])
    )


def test_early_exit_decode(rng):
    """Opt-in stage-granular early exit (eval_decode_early_exit): once
    EVERY row has emitted EOS the remaining scan stages are skipped via
    lax.cond and their slots filled with EOS.

    1. Random init (EOS not emitted by every row within stage 1): the
       cond takes the run branch every stage, so the output must be
       BIT-identical to the flag-off decode — pins that a partially-true
       seen_eos never skips.
    2. EOS-forced generator (zero kernel, EOS-max bias): every row emits
       EOS at step 0, stages 2+ skip, and the caption-level output
       (everything up to and including the first EOS) matches flag-off."""
    from spacap3d_tpu.config import EOS_ID

    base = dataclasses.replace(TINY, eval_decode_stages=4)
    params, state = init_spacap(jax.random.PRNGKey(4), base, _mean_sizes(base))
    batch = tiny_batch(rng, base)
    on_cfg = dataclasses.replace(base, eval_decode_early_exit=True)

    off, _ = make_forward(base, is_eval=True, train=False)(params, state, batch)
    on, _ = make_forward(on_cfg, is_eval=True, train=False)(params, state, batch)
    toks_off = np.asarray(off["lang_cap"])
    toks_on = np.asarray(on["lang_cap"])
    # sanity: this init must exercise the no-skip case (not all rows EOS
    # within the first stage) or the bit-identity below is vacuous
    stage1 = toks_off[..., :2]
    assert not (stage1 == EOS_ID).any(-1).all(), "init emits EOS everywhere"
    np.testing.assert_array_equal(toks_on, toks_off)

    # EOS-forced: constant logits with EOS max -> argmax is EOS at every
    # step for every row; all stages after the first skip
    gen = params["caption"]["model"]["generator"]["proj"]
    forced = jax.tree_util.tree_map(lambda x: x, params)
    bias = np.zeros_like(np.asarray(gen["bias"]))
    bias[EOS_ID] = 5.0
    forced["caption"]["model"]["generator"] = {"proj": {
        "kernel": jnp.zeros_like(gen["kernel"]), "bias": jnp.asarray(bias)}}
    off2, _ = make_forward(base, is_eval=True, train=False)(forced, state, batch)
    on2, _ = make_forward(on_cfg, is_eval=True, train=False)(forced, state, batch)
    t_off = np.asarray(off2["lang_cap"])
    t_on = np.asarray(on2["lang_cap"])
    assert (t_off == EOS_ID).all()
    assert (t_on == EOS_ID).all()   # skip fill value == what decode yields
    # first-EOS truncation (what the harness consumes) identical
    np.testing.assert_array_equal(t_on[..., 0], t_off[..., 0])


def test_eval_decode_matches_full_recompute(rng):
    """KV-cached scan decode must equal the reference's full-recompute loop
    (compared in f32; the bf16-vs-f32 agreement is tested separately)."""
    cfg = dataclasses.replace(TINY, check_relation=False,
                              eval_decode_dtype="float32",
                              eval_decode_stages=1)
    params, state = init_spacap(jax.random.PRNGKey(0), cfg, _mean_sizes(cfg))
    batch = tiny_batch(rng, cfg)
    ep_eval, _ = make_forward(cfg, is_eval=True, train=False)(params, state, batch)
    got = np.asarray(ep_eval["lang_cap"])  # (B, K, 31)

    # Reference-style loop: re-run the full decoder per step via the
    # teacher-forcing path with growing ys.
    from spacap3d_tpu.models import captioner as cap
    from spacap3d_tpu.models.core import RngStream

    model = params["caption"]["model"]
    cstate = state["caption"]
    ep, _ = make_forward(cfg, is_eval=False, train=False)(params, state, batch)
    obj_features = ep["aggregated_vote_features"]
    b, k, c = obj_features.shape
    r = b * k
    rngs = RngStream(None)
    src_mask = ep["bbox_mask"][:, None, :] != 0
    x, _ = cap._src_embed(model, cstate, cfg, obj_features,
                          cap._select_src_pos(cfg, ep), rngs, False, 0.1)
    memory, _, _ = cap._encode(model, cfg, x, src_mask, rngs, False, False)
    obj_token = obj_features.reshape(r, 1, c) + memory.reshape(r, 1, c)

    ys = np.full((r, 1), 2, np.int32)
    for _ in range(cfg.max_des_len + 1):
        t = ys.shape[1]
        emb = cap._tgt_embed(model, cfg, jnp.asarray(ys), jnp.arange(t), rngs, False)
        dec_in = jnp.concatenate([obj_token, emb], axis=1)
        mask = cap.subsequent_mask(t + 1)
        out, _ = cap._decode_full(model, cfg, dec_in, memory, src_mask, mask,
                                  rngs, False)
        logp = cap._generator(model, out[:, -1])
        nxt = np.asarray(jnp.argmax(logp, -1)).astype(np.int32)
        ys = np.concatenate([ys, nxt[:, None]], axis=1)
    want = ys[:, 1:].reshape(b, k, -1)
    np.testing.assert_array_equal(got, want)


def test_forward_no_features(rng):
    """--no_height with xyz-only input: input_feature_dim=0, SA1 consumes
    raw grouped coordinates (reference backbone use_xyz path)."""
    cfg = dataclasses.replace(TINY, input_feature_dim=0, check_relation=False)
    params, state = init_spacap(jax.random.PRNGKey(0), cfg, _mean_sizes(cfg))
    batch = tiny_batch(rng, cfg)
    assert batch["point_clouds"].shape[-1] == 3
    ep, _ = make_forward(cfg, is_eval=False, train=True)(
        params, state, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(np.asarray(ep["lang_cap"])).all()


def test_staged_decode_matches_single_stage(rng):
    """The staged-KV-cache decode (eval_decode_stages>1) computes the same
    valid-score softmax per step; on this fixed tiny config the greedy
    tokens match the single-stage scan exactly (near-tie argmax flips are
    possible in principle — README's numerics table — but deterministic
    per platform/config, so this acts as a regression pin)."""
    cfg1 = dataclasses.replace(TINY, eval_decode_dtype="float32",
                               eval_decode_stages=1)
    params, state = init_spacap(jax.random.PRNGKey(4), cfg1, _mean_sizes(cfg1))
    batch = tiny_batch(rng, cfg1)
    ep1, _ = make_forward(cfg1, is_eval=True, train=False)(params, state, batch)
    cfg4 = dataclasses.replace(TINY, eval_decode_dtype="float32",
                               eval_decode_stages=4)
    ep4, _ = make_forward(cfg4, is_eval=True, train=False)(params, state, batch)
    np.testing.assert_array_equal(
        np.asarray(ep4["lang_cap"]), np.asarray(ep1["lang_cap"])
    )


def test_batch_norm_custom_vjp_matches_autodiff():
    """core.batch_norm's hand-written train-mode VJP must agree with plain
    autodiff of the same two-pass formula (forward bit-equal, grads to fp
    reassociation tolerance)."""
    from spacap3d_tpu.models import core

    rng = jax.random.PRNGKey(42)

    def plain(scale, bias, x, eps=1e-5):
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.mean(jnp.square(x - mean), axis=axes)
        return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias

    def custom(scale, bias, x):
        return core._bn_train(scale, bias, x, 1e-5)[0]

    x = jax.random.normal(rng, (64, 7, 16)) * 3 + 1
    scale = jax.random.normal(jax.random.fold_in(rng, 1), (16,)) + 1
    bias = jax.random.normal(jax.random.fold_in(rng, 2), (16,))
    dy = jax.random.normal(jax.random.fold_in(rng, 3), (64, 7, 16))

    np.testing.assert_array_equal(
        np.asarray(plain(scale, bias, x)), np.asarray(custom(scale, bias, x))
    )
    ga = jax.grad(lambda s, b, xx: jnp.sum(plain(s, b, xx) * dy), (0, 1, 2))(
        scale, bias, x)
    gb = jax.grad(lambda s, b, xx: jnp.sum(custom(s, b, xx) * dy), (0, 1, 2))(
        scale, bias, x)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-6)

    # the state path (mean / unbiased var) still matches the plain formula
    p = {"scale": scale, "bias": bias}
    s = {"mean": jnp.zeros(16), "var": jnp.ones(16)}
    _, ns = core.batch_norm(p, s, x, train=True, momentum=0.1)
    axes = (0, 1)
    mean = jnp.mean(x, axis=axes)
    var = jnp.mean(jnp.square(x - mean), axis=axes)
    n = x.size // x.shape[-1]
    np.testing.assert_allclose(
        np.asarray(ns["mean"]), np.asarray(0.9 * 0 + 0.1 * mean), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ns["var"]),
        np.asarray(0.9 * 1 + 0.1 * var * n / (n - 1)), rtol=1e-6)
