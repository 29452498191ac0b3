"""Captioner weight-conversion parity vs a torch oracle.

Builds a small torch state dict with the reference's key layout
(caption.model.encoder.layers.L.self_attn.linears.i..., custom LayerNorm
a_2/b_2, learned src pos enc conv/bn, embeddings, generator), converts it
through utils/convert.py into our pytree, and checks our teacher-forced
forward against an independently-written torch forward implementing the
reference architecture (pre-LN, std+eps LayerNorm, early-guide decoder
without cross-attention, object token = raw + encoded feature).
"""
import dataclasses
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from spacap3d_tpu.config import ModelConfig
from spacap3d_tpu.models import captioner as cap
from spacap3d_tpu.models.captioner import init_captioner
from spacap3d_tpu.models.core import RngStream
from spacap3d_tpu.utils.convert import convert_state_dict

D, H, L, V, K, B, T = 16, 2, 2, 11, 4, 2, 6  # d_model, heads, layers, ...

CFG = ModelConfig(
    num_proposals=K, vocab_size=V, num_layers=L, num_heads=H, d_model=D,
    d_ff=32, max_des_len=T - 2, src_pos_type="xyz",
    use_transformer_encoder=True, early_guide=True, check_relation=False,
    proposal_feature_dim=D,
)


def make_torch_sd(rng):
    sd = {}

    def lin(name, i, o):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32) * 0.2
        sd[name + ".bias"] = rng.randn(o).astype(np.float32) * 0.1

    def norm(name):
        sd[name + ".a_2"] = 1 + 0.1 * rng.randn(D).astype(np.float32)
        sd[name + ".b_2"] = 0.1 * rng.randn(D).astype(np.float32)

    for stack, nsub in (("encoder", 2), ("decoder", 3)):
        for l in range(L):
            base = f"caption.model.{stack}.layers.{l}"
            for i in range(4):
                lin(f"{base}.self_attn.linears.{i}", D, D)
            if stack == "decoder":
                # early-guide still won't use src_attn; keys may be absent
                pass
            lin(f"{base}.feed_forward.w_1", D, 32)
            lin(f"{base}.feed_forward.w_2", 32, D)
            subs = (0, 1) if stack == "encoder" else (0, 2)
            for s in subs:
                norm(f"{base}.sublayer.{s}.norm")
        norm(f"caption.model.{stack}.norm")

    # learned src position encoding: conv1d(3->D), bn, conv1d(D->D)
    sd["caption.model.src_embed.position_embedding_head.0.weight"] = (
        rng.randn(D, 3, 1).astype(np.float32) * 0.2)
    sd["caption.model.src_embed.position_embedding_head.0.bias"] = (
        rng.randn(D).astype(np.float32) * 0.1)
    sd["caption.model.src_embed.position_embedding_head.1.weight"] = (
        1 + 0.1 * rng.randn(D).astype(np.float32))
    sd["caption.model.src_embed.position_embedding_head.1.bias"] = (
        0.1 * rng.randn(D).astype(np.float32))
    sd["caption.model.src_embed.position_embedding_head.1.running_mean"] = (
        0.1 * rng.randn(D).astype(np.float32))
    sd["caption.model.src_embed.position_embedding_head.1.running_var"] = (
        1 + 0.1 * rng.rand(D).astype(np.float32))
    sd["caption.model.src_embed.position_embedding_head.3.weight"] = (
        rng.randn(D, D, 1).astype(np.float32) * 0.2)
    sd["caption.model.src_embed.position_embedding_head.3.bias"] = (
        rng.randn(D).astype(np.float32) * 0.1)

    sd["caption.model.tgt_embed.0.lut.weight"] = rng.randn(V, D).astype(np.float32) * 0.3
    lin("caption.model.generator.proj", D, V)
    return sd


# ------------------------- torch oracle forward -------------------------

def t_layer_norm(x, a, b, eps=1e-6):
    mean = x.mean(-1, keepdim=True)
    std = x.std(-1, keepdim=True)  # unbiased
    return a * (x - mean) / (std + eps) + b


def t_mha(sd, base, q, k, v, mask):
    def lp(i, x):
        w = torch.from_numpy(sd[f"{base}.linears.{i}.weight"])
        b = torch.from_numpy(sd[f"{base}.linears.{i}.bias"])
        return F.linear(x, w, b)

    nb = q.shape[0]
    dk = D // H
    qh = lp(0, q).view(nb, -1, H, dk).transpose(1, 2)
    kh = lp(1, k).view(nb, -1, H, dk).transpose(1, 2)
    vh = lp(2, v).view(nb, -1, H, dk).transpose(1, 2)
    scores = qh @ kh.transpose(-2, -1) / math.sqrt(dk)
    if mask is not None:
        scores = scores.masked_fill(mask == 0, -1e9)
    p = F.softmax(scores, dim=-1)
    out = (p @ vh).transpose(1, 2).contiguous().view(nb, -1, D)
    return lp(3, out)


def t_ffn(sd, base, x):
    w1 = torch.from_numpy(sd[f"{base}.w_1.weight"])
    b1 = torch.from_numpy(sd[f"{base}.w_1.bias"])
    w2 = torch.from_numpy(sd[f"{base}.w_2.weight"])
    b2 = torch.from_numpy(sd[f"{base}.w_2.bias"])
    return F.linear(F.relu(F.linear(x, w1, b1)), w2, b2)


def t_sublayer(sd, base, x, fn):
    a = torch.from_numpy(sd[f"{base}.norm.a_2"])
    b = torch.from_numpy(sd[f"{base}.norm.b_2"])
    return x + fn(t_layer_norm(x, a, b))


def t_sinusoid(t):
    pos = torch.arange(t).unsqueeze(1).float()
    div = torch.exp(torch.arange(0, D, 2).float() * -(math.log(10000.0) / D))
    pe = torch.zeros(t, D)
    pe[:, 0::2] = torch.sin(pos * div)
    pe[:, 1::2] = torch.cos(pos * div)
    return pe


def torch_forward(sd, src, src_pos, bbox_mask, lang_label, ref_idx):
    src = torch.from_numpy(src)
    # learned src pos embed (conv1d == linear over channel, bn eval)
    w0 = torch.from_numpy(sd["caption.model.src_embed.position_embedding_head.0.weight"][:, :, 0])
    b0 = torch.from_numpy(sd["caption.model.src_embed.position_embedding_head.0.bias"])
    h = F.linear(torch.from_numpy(src_pos), w0, b0)
    g = torch.from_numpy(sd["caption.model.src_embed.position_embedding_head.1.weight"])
    be = torch.from_numpy(sd["caption.model.src_embed.position_embedding_head.1.bias"])
    rm = torch.from_numpy(sd["caption.model.src_embed.position_embedding_head.1.running_mean"])
    rv = torch.from_numpy(sd["caption.model.src_embed.position_embedding_head.1.running_var"])
    h = (h - rm) / torch.sqrt(rv + 1e-5) * g + be
    h = F.relu(h)
    w1 = torch.from_numpy(sd["caption.model.src_embed.position_embedding_head.3.weight"][:, :, 0])
    b1 = torch.from_numpy(sd["caption.model.src_embed.position_embedding_head.3.bias"])
    x = src + F.linear(h, w1, b1)

    src_mask = torch.from_numpy(bbox_mask)[:, None, None, :]  # (B,1,1,K)
    for l in range(L):
        base = f"caption.model.encoder.layers.{l}"
        x = t_sublayer(sd, f"{base}.sublayer.0", x,
                       lambda xn: t_mha(sd, f"{base}.self_attn", xn, xn, xn, src_mask))
        x = t_sublayer(sd, f"{base}.sublayer.1", x,
                       lambda xn: t_ffn(sd, f"{base}.feed_forward", xn))
    memory = t_layer_norm(
        x, torch.from_numpy(sd["caption.model.encoder.norm.a_2"]),
        torch.from_numpy(sd["caption.model.encoder.norm.b_2"]))

    # object token: raw + encoded feature at ref_idx
    obj = (src[torch.arange(B), ref_idx]
           + memory[torch.arange(B), ref_idx])[:, None, :]

    seq_full = torch.from_numpy(lang_label[:, :-1])
    t = seq_full.shape[1]
    causal = torch.tril(torch.ones(t, t, dtype=torch.bool))
    tgt_mask = ((seq_full > 0)[:, None, :] & causal)[:, None]  # (B,1,T,T)

    lut = torch.from_numpy(sd["caption.model.tgt_embed.0.lut.weight"])
    emb = lut[seq_full[:, 1:]] * math.sqrt(D) + t_sinusoid(t - 1)
    y = torch.cat([obj, emb], dim=1)
    for l in range(L):
        base = f"caption.model.decoder.layers.{l}"
        y = t_sublayer(sd, f"{base}.sublayer.0", y,
                       lambda yn: t_mha(sd, f"{base}.self_attn", yn, yn, yn, tgt_mask))
        y = t_sublayer(sd, f"{base}.sublayer.2", y,
                       lambda yn: t_ffn(sd, f"{base}.feed_forward", yn))
    y = t_layer_norm(
        y, torch.from_numpy(sd["caption.model.decoder.norm.a_2"]),
        torch.from_numpy(sd["caption.model.decoder.norm.b_2"]))
    out = y[:, 1:]
    wg = torch.from_numpy(sd["caption.model.generator.proj.weight"])
    bg = torch.from_numpy(sd["caption.model.generator.proj.bias"])
    return F.log_softmax(F.linear(out, wg, bg), dim=-1)


def test_converted_captioner_matches_torch_oracle(rng):
    sd = make_torch_sd(rng)
    params, state = init_captioner(jax.random.PRNGKey(0), CFG)
    params = {"caption": params}
    state = {"caption": state}
    params, state, report = convert_state_dict(sd, params, state)
    assert not report["skipped"], report["skipped"][:4]

    src = rng.randn(B, K, D).astype(np.float32)
    xyz = rng.randn(B, K, 3).astype(np.float32)
    bbox_mask = rng.randint(0, 2, (B, K)).astype(np.int64)
    bbox_mask[:, 0] = 1  # at least one valid key per row
    lang_label = np.zeros((B, T + 1), np.int64)
    lang_label[:, 0] = 1
    lang_label[:, 1] = 2
    lang_label[:, 2:T - 1] = rng.randint(4, V, (B, T - 3))
    lang_label[:, T - 1] = 3
    ref_center = rng.randn(B, 3).astype(np.float32)

    ep = {
        "aggregated_vote_features": jnp.asarray(src),
        "aggregated_vote_xyz": jnp.asarray(xyz),
        "bbox_mask": jnp.asarray(bbox_mask),
        "lang_label": jnp.asarray(lang_label),
        "ref_center_label": jnp.asarray(ref_center),
    }
    out_ep, _ = cap.captioner_train(
        params["caption"], state["caption"], CFG, ep, rng=None, train=False
    )
    got = np.asarray(out_ep["lang_cap"])

    # torch oracle needs the same ref idx (nearest proposal to ref center)
    d2 = ((xyz - ref_center[:, None]) ** 2).sum(-1)
    ref_idx = torch.from_numpy(d2.argmin(1))
    want = torch_forward(sd, src, xyz, bbox_mask, lang_label, ref_idx).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
