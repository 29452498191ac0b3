"""Spatiality-guided transformer captioner.

TPU-native redesign of reference models/transformer_captioner.py:17-453.

Behavioral contracts preserved exactly:
  * pre-LN blocks with the reference's custom LayerNorm (unbiased std +
    eps-on-std, :102-113) and a final LayerNorm after each stack;
  * attention: scores/sqrt(d_k), masked positions set to -1e9, softmax,
    dropout on the probabilities (:27-37);
  * early_guide decoder layers have NO cross-attention (:223-224) — the
    target-object token is prepended as decoder position 0 instead
    (:200-202); late_guide cross-attends to the single object token;
  * the object token = raw aggregated proposal feature, plus the encoded
    memory feature of the matched proposal when the encoder is on
    (:255-261);
  * caption positions get sinusoidal PE; the prepended object token gets
    none (it is concatenated after tgt_embed);
  * the spatial-relation head consumes the LAST encoder layer's
    (dropout-ed, at train) attention probabilities x value heads
    (:391-398): rel[b,i,j] = concat_h(attn[b,h,i,j] * value[b,h,j,:]).

TPU redesign of the decode loop: the reference re-runs the whole decoder
for every one of the 31 greedy steps over all B*K=2048 rows with no KV
cache (:435-447). Here decoding is a single ``lax.scan`` with a
static-shape per-layer KV cache — mathematically identical because the
decoder is causal and pre-LN.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from spacap3d_tpu.config import EOS_ID, MAX_DES_LEN, SOS_ID, ModelConfig
from spacap3d_tpu.models import core
from spacap3d_tpu.models.core import Params, RngStream, State
from spacap3d_tpu.ops.nn_distance import nn_distance

NEG_INF = -1e9


# -----------------------------------------------------------------------------
# building blocks
# -----------------------------------------------------------------------------

def sinusoid_pe(max_len: int, d_model: int) -> jnp.ndarray:
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * -(math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((max_len, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe


def subsequent_mask(size: int) -> jnp.ndarray:
    """(1, size, size) bool; True where attendance is allowed (causal)."""
    return jnp.tril(jnp.ones((1, size, size), bool))


def init_mha(key, d_model):
    keys = jax.random.split(key, 4)
    return {
        f"linears{i}": core.init_dense(keys[i], d_model, d_model, init="xavier")
        for i in range(4)
    }


def attention(q, k, v, mask, rng, rate, train):
    """q,k,v: (B, h, T, dk); mask: broadcastable bool (.., T, S) or None."""
    dk = q.shape[-1]
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(dk)
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    p = core.dropout(rng, p, rate, train)
    return jnp.einsum("bhts,bhsd->bhtd", p, v), p


def split_heads(x, h):
    b, t, d = x.shape
    return x.reshape(b, t, h, d // h).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, h, t, dk = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dk)


def mha(p, query, key, value, mask, h, rng, rate, train, return_aux=False):
    q = split_heads(core.dense(p["linears0"], query), h)
    k = split_heads(core.dense(p["linears1"], key), h)
    v = split_heads(core.dense(p["linears2"], value), h)
    if mask is not None and mask.ndim == 3:
        mask = mask[:, None]  # broadcast over heads
    x, attn = attention(q, k, v, mask, rng, rate, train)
    out = core.dense(p["linears3"], merge_heads(x))
    if return_aux:
        return out, attn, v
    return out


def init_ffn(key, d_model, d_ff):
    k1, k2 = jax.random.split(key)
    return {
        "w_1": core.init_dense(k1, d_model, d_ff, init="xavier"),
        "w_2": core.init_dense(k2, d_ff, d_model, init="xavier"),
    }


def ffn(p, x, rng, rate, train):
    h = jax.nn.relu(core.dense(p["w_1"], x))
    h = core.dropout(rng, h, rate, train)
    return core.dense(p["w_2"], h)


def sublayer(p_norm, x, fn, rng, rate, train):
    """Pre-LN residual: x + dropout(fn(norm(x)))."""
    return x + core.dropout(rng, fn(core.ref_layer_norm(p_norm, x)), rate, train)


# -----------------------------------------------------------------------------
# init
# -----------------------------------------------------------------------------

def init_encoder_layer(key, d_model, d_ff):
    k1, k2 = jax.random.split(key)
    return {
        "self_attn": init_mha(k1, d_model),
        "feed_forward": init_ffn(k2, d_model, d_ff),
        "sublayer0": {"norm": core.init_layer_norm(d_model)},
        "sublayer1": {"norm": core.init_layer_norm(d_model)},
    }


def init_decoder_layer(key, d_model, d_ff, early_guide):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "self_attn": init_mha(k1, d_model),
        "feed_forward": init_ffn(k3, d_model, d_ff),
        "sublayer0": {"norm": core.init_layer_norm(d_model)},
        "sublayer2": {"norm": core.init_layer_norm(d_model)},
    }
    if not early_guide:
        p["src_attn"] = init_mha(k2, d_model)
        p["sublayer1"] = {"norm": core.init_layer_norm(d_model)}
    return p


def init_captioner(key, cfg: ModelConfig) -> Tuple[Params, State]:
    d, dff, n = cfg.d_model, cfg.d_ff, cfg.num_layers
    keys = iter(jax.random.split(key, 4 * n + 8))
    model: Dict[str, Any] = {}
    state: Dict[str, Any] = {}

    if cfg.use_transformer_encoder:
        model["encoder"] = {
            "layers": [init_encoder_layer(next(keys), d, dff) for _ in range(n)],
            "norm": core.init_layer_norm(d),
        }
        if cfg.src_pos_type is not None:
            in_ch = 3 if cfg.src_pos_type in ("xyz", "center") else 6
            bn_p, bn_s = core.init_batch_norm(d)
            model["src_embed"] = {
                "conv0": core.init_dense(next(keys), in_ch, d, init="xavier"),
                "bn": bn_p,
                "conv1": core.init_dense(next(keys), d, d, init="xavier"),
            }
            state["src_embed"] = {"bn": bn_s}

    model["decoder"] = {
        "layers": [
            init_decoder_layer(next(keys), d, dff, cfg.early_guide) for _ in range(n)
        ],
        "norm": core.init_layer_norm(d),
    }
    model["tgt_embed"] = {
        "lut": {"kernel": core.xavier_uniform(next(keys), cfg.vocab_size, d)}
    }
    model["generator"] = {"proj": core.init_dense(next(keys), d, cfg.vocab_size, init="xavier")}

    params = {"model": model}
    if cfg.check_relation:
        params["relation_proposal"] = {
            "l0": core.init_dense(next(keys), d, d),
            "l2": core.init_dense(next(keys), d, d),
            "l4": core.init_dense(next(keys), d, 9),
        }
    return params, state


# -----------------------------------------------------------------------------
# forward pieces
# -----------------------------------------------------------------------------

def _src_embed(p, s, cfg: ModelConfig, src, src_pos, rngs, train, momentum):
    """Learned (Conv-BN-ReLU-Conv on positions, :149-164) or sinusoidal PE."""
    if cfg.src_pos_type is not None:
        h = core.dense(p["src_embed"]["conv0"], src_pos)
        h, bn_s = core.batch_norm(
            p["src_embed"]["bn"], s["src_embed"]["bn"], h, train, momentum
        )
        h = jax.nn.relu(h)
        h = core.dense(p["src_embed"]["conv1"], h)
        return src + h, {"src_embed": {"bn": bn_s}}
    pe = sinusoid_pe(src.shape[1], cfg.d_model)
    out = core.dropout(rngs.next(), src + pe[None], cfg.transformer_dropout, train)
    return out, {}


def _tgt_embed(p, cfg: ModelConfig, tokens, positions, rngs, train):
    """Embedding * sqrt(d) + sinusoidal PE + dropout (:83-91, :129-147).

    positions: int array, PE index per token (for decode steps)."""
    emb = jnp.take(p["tgt_embed"]["lut"]["kernel"], tokens, axis=0) * math.sqrt(cfg.d_model)
    pe = sinusoid_pe(cfg.max_des_len + 4, cfg.d_model)
    emb = emb + pe[positions]
    return core.dropout(rngs.next(), emb, cfg.transformer_dropout, train)


def _encode(p, cfg: ModelConfig, x, src_mask, rngs, train, want_relation):
    rate = cfg.transformer_dropout
    aux = None
    layers = p["encoder"]["layers"]
    attn_all = []
    for i, layer in enumerate(layers):
        last = i == len(layers) - 1

        def self_attn_fn(xn, layer=layer, last=last):
            nonlocal aux
            out, attn, v = mha(
                layer["self_attn"], xn, xn, xn, src_mask, cfg.num_heads,
                rngs.next(), rate, train, return_aux=True,
            )
            attn_all.append(attn)
            if last and want_relation:
                aux = (attn, v)
            return out

        x = sublayer(layer["sublayer0"]["norm"], x, self_attn_fn, rngs.next(), rate, train)
        x = sublayer(
            layer["sublayer1"]["norm"], x,
            lambda xn, layer=layer: ffn(layer["feed_forward"], xn, rngs.next(), rate, train),
            rngs.next(), rate, train,
        )
    return core.ref_layer_norm(p["encoder"]["norm"], x), aux, attn_all


def _decode_full(p, cfg: ModelConfig, x, memory, src_mask, tgt_mask, rngs, train):
    """Full-sequence decoder (teacher forcing / attention dumps)."""
    rate = cfg.transformer_dropout
    attn_all = []
    for layer in p["decoder"]["layers"]:
        def self_attn_fn(xn, layer=layer):
            out, attn, _ = mha(
                layer["self_attn"], xn, xn, xn, tgt_mask, cfg.num_heads,
                rngs.next(), rate, train, return_aux=True,
            )
            attn_all.append(attn)
            return out

        x = sublayer(layer["sublayer0"]["norm"], x, self_attn_fn, rngs.next(), rate, train)
        if not cfg.early_guide:
            x = sublayer(
                layer["sublayer1"]["norm"], x,
                lambda xn, layer=layer: mha(
                    layer["src_attn"], xn, memory, memory, src_mask,
                    cfg.num_heads, rngs.next(), rate, train,
                ),
                rngs.next(), rate, train,
            )
        x = sublayer(
            layer["sublayer2"]["norm"], x,
            lambda xn, layer=layer: ffn(layer["feed_forward"], xn, rngs.next(), rate, train),
            rngs.next(), rate, train,
        )
    return core.ref_layer_norm(p["decoder"]["norm"], x), attn_all


def _generator(p, x):
    return jax.nn.log_softmax(core.dense(p["generator"]["proj"], x), axis=-1)


def _relation_head(p, attn, value):
    """attn (B,h,K,K), value (B,h,K,dk) -> (B,K,K,9) (:391-398).

    The reference materializes rel[b,i,j] = concat_h(attn[b,h,i,j] *
    value[b,h,j]) — (B,K,K,h*dk), 268 MB f32 at flagship shapes — and
    feeds it to the first linear layer. l0 is linear, so fold it through
    the outer product instead:
        rel @ W0 == sum_h attn[b,h,i,j] * (value[b,h,j] @ W0_h)
    with W0_h = W0.reshape(h, dk, C)[h]. The (B,K,K,h*dk) tensor never
    exists (fwd OR bwd) and the big contraction shrinks 16x (over h=8
    heads instead of h*dk=128 channels). Exact up to f32 reassociation
    (pinned by the relation_pred reference-parity test at 2e-5)."""
    b, h, k, dk = value.shape
    w0 = p["relation_proposal"]["l0"]["kernel"]          # (h*dk, C)
    vw = jnp.einsum("bhjd,hdc->bhjc", value, w0.reshape(h, dk, -1),
                    preferred_element_type=jnp.float32)
    h1 = jnp.einsum("bhij,bhjc->bijc", attn, vw,
                    preferred_element_type=jnp.float32)
    h1 = jax.nn.relu(h1 + p["relation_proposal"]["l0"]["bias"])
    h2 = jax.nn.relu(core.dense(p["relation_proposal"]["l2"], h1))
    return core.dense(p["relation_proposal"]["l4"], h2)


def _select_src_pos(cfg: ModelConfig, ep: Dict[str, jnp.ndarray]):
    if cfg.src_pos_type == "xyz":
        return ep["aggregated_vote_xyz"]
    if cfg.src_pos_type == "center":
        return ep["center"]
    if cfg.src_pos_type == "loc":
        return jnp.concatenate([ep["center"], ep["pred_size"]], axis=-1)
    return None


# -----------------------------------------------------------------------------
# train forward
# -----------------------------------------------------------------------------

def captioner_train(
    p: Params, s: State, cfg: ModelConfig,
    ep: Dict[str, jnp.ndarray],
    rng: Optional[jax.Array], train: bool, momentum=0.1,
) -> Tuple[Dict[str, jnp.ndarray], State]:
    """Teacher-forced forward (reference :351-400). Consumes the detector
    endpoints dict, returns new endpoints + captioner state."""
    rngs = RngStream(rng)
    model = p["model"]
    new_state: Dict[str, Any] = {}

    src = ep["aggregated_vote_features"]  # (B, K, C)
    src_pos = _select_src_pos(cfg, ep)

    # proposal matched to the annotated object (:366-368)
    _, _, target_d2, idx = nn_distance(
        ep["aggregated_vote_xyz"], ep["ref_center_label"][:, None, :]
    )
    idx = idx  # (B, 1)
    ref_obj_feature = jnp.take_along_axis(src, idx[..., None], axis=1)  # (B,1,C)

    # target sequence + mask (:329-341)
    lang_label = ep["lang_label"]  # (B, L+2) int
    if cfg.early_guide:
        seq_full = lang_label[:, :-1]
        t = seq_full.shape[1]
        tgt_mask = (seq_full > 0)[:, None, :] & subsequent_mask(t)
        tgt_tokens = seq_full[:, 1:]
        positions = jnp.arange(tgt_tokens.shape[1])
    else:
        seq_full = lang_label[:, 1:-1]
        t = seq_full.shape[1]
        tgt_mask = (seq_full > 0)[:, None, :] & subsequent_mask(t)
        tgt_tokens = seq_full
        positions = jnp.arange(tgt_tokens.shape[1])

    src_mask = ep["bbox_mask"][:, None, :] != 0  # (B, 1, K)

    relation_aux = None
    if cfg.use_transformer_encoder:
        x, emb_s = _src_embed(model, s, cfg, src, src_pos, rngs, train, momentum)
        new_state.update(emb_s)
        memory, relation_aux, _ = _encode(
            model, cfg, x, src_mask, rngs, train, cfg.check_relation
        )
        obj_indicator = ref_obj_feature + jnp.take_along_axis(memory, idx[..., None], axis=1)
    else:
        memory = src
        obj_indicator = ref_obj_feature

    tgt_emb = _tgt_embed(model, cfg, tgt_tokens, positions, rngs, train)
    if cfg.early_guide:
        dec_in = jnp.concatenate([obj_indicator, tgt_emb], axis=1)
        out, _ = _decode_full(model, cfg, dec_in, memory, src_mask, tgt_mask, rngs, train)
        out = out[:, 1:]
    else:
        out, _ = _decode_full(
            model, cfg, tgt_emb, obj_indicator, None, tgt_mask, rngs, train
        )

    new_ep = dict(ep)
    new_ep["lang_cap"] = _generator(model, out)          # (B, T, V) log-probs
    new_ep["match_idx"] = idx[:, 0]

    # good_bbox_masks: target_ious is a squared distance, always > -1 (:383)
    good = target_d2[:, 0] > -1
    new_ep["good_bbox_masks"] = good
    new_ep["pred_ious"] = jnp.where(
        jnp.sum(good) > 0, jnp.mean(jnp.where(good, target_d2[:, 0], 0.0)), 0.0
    )

    if cfg.check_relation and relation_aux is not None:
        attn, value = relation_aux
        new_ep["relation_pred"] = _relation_head(p, attn, value)

    return new_ep, new_state


# -----------------------------------------------------------------------------
# eval forward: KV-cached greedy decode
# -----------------------------------------------------------------------------

def _fuse_qkv(layer):
    """Concatenate the q/k/v projections into one (d, 3d) matmul — hoisted
    out of the decode scan so each step runs one projection instead of
    three tiny ones."""
    attn = layer["self_attn"]
    return {
        "kernel": jnp.concatenate(
            [attn["linears0"]["kernel"], attn["linears1"]["kernel"],
             attn["linears2"]["kernel"]], axis=1,
        ),
        "bias": jnp.concatenate(
            [attn["linears0"]["bias"], attn["linears1"]["bias"],
             attn["linears2"]["bias"]]
        ),
    }


def _cast_tree(tree, dtype):
    """Cast every float32 leaf (accessed by key afterwards, so tree_map's
    key re-sorting is harmless)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tree
    )


def _decode_step(model, cfg: ModelConfig, x, caches, pos, cross_kv,
                 qkv_fused=None, dd=jnp.float32, fused_ffn=False):
    """One decoder step for the newest token.

    x: (R, 1, d) input embedding (dtype ``dd``); caches: list per layer of
    (k, v) with shape (R, h, Lmax, dk) in ``dd``; pos: current position
    (int32) — cache slots < pos are valid, slot ``pos`` is written this
    step. ``model``/``qkv_fused``/``cross_kv`` weights are pre-cast to
    ``dd`` by the caller. LayerNorm statistics and attention softmax run
    in f32 regardless; matmuls accumulate in f32 (preferred_element_type)
    so ``dd=bfloat16`` only halves the HBM traffic of weights, caches and
    the residual stream, not the accumulation precision.
    Returns (hidden (R, d) f32, new caches).
    """
    h = cfg.num_heads
    d = cfg.d_model
    new_caches = []
    lmax = caches[0][0].shape[2]
    valid = (jnp.arange(lmax) <= pos)[None, None, None, :]  # (1,1,1,Lmax)

    def norm(p, x):
        return core.ref_layer_norm(p, x.astype(jnp.float32)).astype(dd)

    for li, layer in enumerate(model["decoder"]["layers"]):
        k_cache, v_cache = caches[li]

        xn = norm(layer["sublayer0"]["norm"], x)
        if qkv_fused is not None:
            qkv = core.dense(qkv_fused[li], xn)
            q = split_heads(qkv[..., :d], h)
            k_new = split_heads(qkv[..., d:2 * d], h)
            v_new = split_heads(qkv[..., 2 * d:], h)
        else:
            q = split_heads(core.dense(layer["self_attn"]["linears0"], xn), h)
            k_new = split_heads(core.dense(layer["self_attn"]["linears1"], xn), h)
            v_new = split_heads(core.dense(layer["self_attn"]["linears2"], xn), h)
        k_cache = lax.dynamic_update_slice(
            k_cache, k_new.astype(dd), (0, 0, pos, 0))
        v_cache = lax.dynamic_update_slice(
            v_cache, v_new.astype(dd), (0, 0, pos, 0))
        new_caches.append((k_cache, v_cache))

        scores = jnp.einsum(
            "bhtd,bhsd->bhts", q.astype(dd), k_cache,
            preferred_element_type=jnp.float32,
        ) / math.sqrt(cfg.d_model // h)
        scores = jnp.where(valid, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        att = jnp.einsum("bhts,bhsd->bhtd", probs.astype(dd), v_cache,
                         preferred_element_type=jnp.float32)
        x = x + core.dense(layer["self_attn"]["linears3"],
                           merge_heads(att).astype(dd)).astype(dd)

        if not cfg.early_guide:
            xn = norm(layer["sublayer1"]["norm"], x)
            ck, cv = cross_kv[li]  # (R, h, 1, dk) precomputed from obj token
            q = split_heads(core.dense(layer["src_attn"]["linears0"], xn), h)
            scores = jnp.einsum("bhtd,bhsd->bhts", q.astype(dd), ck,
                                preferred_element_type=jnp.float32) \
                / math.sqrt(cfg.d_model // h)
            probs = jax.nn.softmax(scores, axis=-1)
            att = jnp.einsum("bhts,bhsd->bhtd", probs.astype(dd), cv,
                             preferred_element_type=jnp.float32)
            x = x + core.dense(layer["src_attn"]["linears3"],
                               merge_heads(att).astype(dd)).astype(dd)

        xn = norm(layer["sublayer2"]["norm"], x)
        ff = layer["feed_forward"]
        if fused_ffn:
            # fused Pallas FFN (ops/decode_pallas.py): identical op
            # sequence, the (R, d_ff) hidden stays in VMEM
            from spacap3d_tpu.ops import decode_pallas

            y = decode_pallas.ffn(xn[:, 0], ff["w_1"]["kernel"],
                                  ff["w_1"]["bias"], ff["w_2"]["kernel"],
                                  ff["w_2"]["bias"])
            x = x + y[:, None]
        else:
            x = x + core.dense(
                ff["w_2"],
                jax.nn.relu(core.dense(ff["w_1"], xn)).astype(dd),
            ).astype(dd)
    out = core.ref_layer_norm(model["decoder"]["norm"],
                              x.astype(jnp.float32))
    return out[:, 0], new_caches


def captioner_attention_dump(
    p: Params, s: State, cfg: ModelConfig,
    ep: Dict[str, jnp.ndarray], tokens: jnp.ndarray,
):
    """Attention-weight dumps for analysis (parity with the reference's
    --save_encoder_attn/--save_decoder_attn, lib/eval_helper.py:99-121).

    tokens: (B, K, T) generated ids. Returns (enc_attn (L,B,h,K,K),
    dec_attn (L, B*K, h, T', T')) where T' includes the object token in
    early-guide mode. The decoder weights come from a teacher-forced
    rerun over the generated tokens — identical to the last-step weights
    of the reference's recompute-everything loop."""
    model = p["model"]
    rngs = RngStream(None)
    obj_features = ep["aggregated_vote_features"]
    b, k, c = obj_features.shape
    r = b * k
    src_mask = ep["bbox_mask"][:, None, :] != 0

    enc_attn = []
    if cfg.use_transformer_encoder:
        x, _ = _src_embed(model, s, cfg, obj_features,
                          _select_src_pos(cfg, ep), rngs, False, 0.1)
        memory, _, enc_attn = _encode(model, cfg, x, src_mask, rngs, False, False)
        obj_token = obj_features.reshape(r, 1, c) + memory.reshape(r, 1, c)
    else:
        memory = obj_features
        obj_token = obj_features.reshape(r, 1, c)

    t = tokens.shape[-1]
    flat = tokens.reshape(r, t)
    emb = _tgt_embed(model, cfg, flat, jnp.arange(t), rngs, False)
    if cfg.early_guide:
        dec_in = jnp.concatenate([obj_token, emb], axis=1)
        mask = subsequent_mask(t + 1)
        _, dec_attn = _decode_full(model, cfg, dec_in, memory, src_mask, mask,
                                   rngs, False)
    else:
        mask = subsequent_mask(t)
        _, dec_attn = _decode_full(model, cfg, emb, obj_token, None, mask,
                                   rngs, False)
    enc = jnp.stack(enc_attn) if enc_attn else jnp.zeros((0,))
    dec = jnp.stack(dec_attn) if dec_attn else jnp.zeros((0,))
    return enc, dec


def captioner_eval(
    p: Params, s: State, cfg: ModelConfig,
    ep: Dict[str, jnp.ndarray],
) -> Dict[str, jnp.ndarray]:
    """Greedy decode over all proposals at once (reference :402-453),
    rewritten as a lax.scan with KV caches. Deterministic (no dropout)."""
    model = p["model"]
    rngs = RngStream(None)

    obj_features = ep["aggregated_vote_features"]  # (B, K, C)
    b, k, c = obj_features.shape
    r = b * k
    src_pos = _select_src_pos(cfg, ep)
    src_mask = ep["bbox_mask"][:, None, :] != 0

    if cfg.use_transformer_encoder:
        x, _ = _src_embed(model, s, cfg, obj_features, src_pos, rngs, False, 0.1)
        memory, _, enc_attn = _encode(model, cfg, x, src_mask, rngs, False, False)
        # (:252-257) object token = raw feature + encoded memory feature
        obj_token = obj_features.reshape(r, 1, c) + memory.reshape(r, 1, c)
    else:
        obj_token = obj_features.reshape(r, 1, c)
        enc_attn = []

    max_len = cfg.max_des_len
    n_steps = max_len + 1            # 31 greedy steps (:435)
    offset_len = 1 if cfg.early_guide else 0
    lmax = n_steps + offset_len + 1
    h = cfg.num_heads
    dk = cfg.d_model // h
    n_layers = cfg.num_layers

    # Decode-loop dtype: bf16 halves the HBM traffic of the per-step
    # weights, KV caches, residual stream, embedding table and generator;
    # all matmuls still accumulate in f32 and the argmax runs on f32
    # logits (see ModelConfig.eval_decode_dtype).
    dd = jnp.dtype(cfg.eval_decode_dtype)
    dec_model = {"decoder": _cast_tree(model["decoder"], dd)}
    lut = model["tgt_embed"]["lut"]["kernel"].astype(dd)
    gen = _cast_tree(model["generator"]["proj"], dd)
    pe = sinusoid_pe(cfg.max_des_len + 4, cfg.d_model).astype(dd)

    # Staged (bucketed) KV caches: the decode is bound by re-reading the
    # caches every step, but step i only attends to positions <= i+offset
    # — running the scan in stages whose cache length grows with the
    # position cuts total cache traffic ~1.6x. Masked padding slots hold
    # exact zeros, so attention over a shorter cache computes the same
    # valid-score softmax. Stage boundaries pad the caches (a one-time
    # copy, ~0.3 ms total at flagship scale).
    n_stages = max(1, int(getattr(cfg, "eval_decode_stages", 4)))
    n_stages = min(n_stages, n_steps)
    bounds = [round(n_steps * (s + 1) / n_stages) for s in range(n_stages)]
    stages = []  # (start_step, num_steps, cache_len)
    start = 0
    for s, end in enumerate(bounds):
        size = lmax if s == n_stages - 1 else end + offset_len + 1
        stages.append((start, end - start, size))
        start = end

    caches = [
        (jnp.zeros((r, h, stages[0][2], dk), dd),
         jnp.zeros((r, h, stages[0][2], dk), dd))
        for _ in range(n_layers)
    ]

    cross_kv = None
    if not cfg.early_guide:
        cross_kv = []
        obj_dd = obj_token.astype(dd)
        for layer in dec_model["decoder"]["layers"]:
            ck = split_heads(core.dense(layer["src_attn"]["linears1"], obj_dd), h)
            cv = split_heads(core.dense(layer["src_attn"]["linears2"], obj_dd), h)
            cross_kv.append((ck.astype(dd), cv.astype(dd)))

    qkv_fused = [_fuse_qkv(layer) for layer in dec_model["decoder"]["layers"]]

    # Fused Pallas decode kernels (ops/decode_pallas.py): engage only for
    # the bf16 decode on a TPU backend — the f32 parity paths and CPU CI
    # keep the XLA composites. The generator pad is hoisted out of the
    # scan here (weights are loop-invariant).
    use_fused = (getattr(cfg, "eval_decode_fused", False)
                 and dd == jnp.bfloat16
                 and jax.default_backend() == "tpu")
    gen_fused = None
    if use_fused:
        from spacap3d_tpu.ops import decode_pallas

        gen_fused = decode_pallas.pad_generator(gen, gen["kernel"].shape[1])

    offset = 0
    if cfg.early_guide:
        # warm-up step: process the object token at cache position 0
        _, caches = _decode_step(dec_model, cfg, obj_token.astype(dd), caches,
                                 jnp.int32(0), cross_kv, qkv_fused, dd=dd,
                                 fused_ffn=use_fused)
        offset = 1

    def flatten(cs):
        return tuple(t for pair in cs for t in pair)

    def unflatten(flat):
        return [(flat[2 * i], flat[2 * i + 1]) for i in range(n_layers)]

    sqrt_d = jnp.asarray(math.sqrt(cfg.d_model), dd)

    def step(carry, i):
        token, flat_caches = carry
        emb = (jnp.take(lut, token[:, None], axis=0) * sqrt_d + pe[i]).astype(dd)
        hid, new_caches = _decode_step(
            dec_model, cfg, emb, unflatten(flat_caches), i + offset, cross_kv,
            qkv_fused, dd=dd, fused_ffn=use_fused,
        )
        # argmax(logits) == argmax(log_softmax(logits)): skip the softmax
        if gen_fused is not None:
            from spacap3d_tpu.ops import decode_pallas

            nxt = decode_pallas.generator_argmax(hid.astype(dd), *gen_fused)
        else:
            logits = core.dense(gen, hid.astype(dd))      # f32 accumulate
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, flatten(new_caches)), nxt

    token = jnp.full((r,), SOS_ID, jnp.int32)
    stage_tokens = []
    seen_eos = jnp.zeros((r,), bool)
    for s, (s0, s_steps, size) in enumerate(stages):
        if s:
            grow = size - stages[s - 1][2]
            caches = [
                (jnp.pad(kc, ((0, 0), (0, 0), (0, grow), (0, 0))),
                 jnp.pad(vc, ((0, 0), (0, 0), (0, grow), (0, 0))))
                for kc, vc in caches
            ]
        steps_arr = jnp.arange(s0, s0 + s_steps, dtype=jnp.int32)
        if cfg.eval_decode_early_exit and s:
            # Once every row has emitted EOS, later stages can't change
            # the final captions (the harness truncates at the first
            # EOS): skip the whole stage and fill its slots with EOS.
            # lax.cond executes ONE branch at runtime, so trained models
            # (captions typically end ~10-15 of 31 steps) skip most of
            # the decode tail. Raw tokens after the all-EOS point differ
            # from the always-decode path — caption-level equality is
            # pinned in tests; the flag defaults off for the raw-token
            # parity guarantees.
            def run_stage(operands):
                tok, fl = operands
                (tok, fl), toks = lax.scan(step, (tok, fl), steps_arr)
                return tok, fl, toks

            def skip_stage(operands):
                tok, fl = operands
                return tok, fl, jnp.full((s_steps, r), EOS_ID, jnp.int32)

            token, flat, toks = lax.cond(
                jnp.logical_not(jnp.all(seen_eos)), run_stage, skip_stage,
                (token, flatten(caches)),
            )
        else:
            (token, flat), toks = lax.scan(
                step, (token, flatten(caches)), steps_arr,
            )
        if cfg.eval_decode_early_exit:
            seen_eos = jnp.logical_or(seen_eos,
                                      jnp.any(toks == EOS_ID, axis=0))
        caches = unflatten(flat)
        stage_tokens.append(toks)
    tokens = jnp.concatenate(stage_tokens, axis=0)
    # tokens: (n_steps, R) -> (B, K, n_steps)
    out_tokens = tokens.T.reshape(b, k, n_steps)

    new_ep = dict(ep)
    new_ep["lang_cap"] = out_tokens
    return new_ep
