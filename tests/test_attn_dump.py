"""Attention-dump path: shapes + integration with feed_scene_cap."""
import dataclasses

import jax
import numpy as np

from spacap3d_tpu.train.step import make_attn_dump_step, make_eval_step
from tests.test_train_e2e import MODEL_CFG, setup  # noqa: F401  (fixture)


def test_attn_dump_shapes(setup):  # noqa: F811
    _, anns, ds, vocab, dc, cfg, params, state = setup
    from spacap3d_tpu.data.loader import DataLoader

    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    batch = next(iter(dl))
    eval_step = make_eval_step(cfg)
    out = eval_step(params, state, batch)
    tokens = out["lang_cap"]

    dump = make_attn_dump_step(cfg)
    enc, dec = dump(params, state, batch, tokens)
    b, k, t = tokens.shape
    assert enc.shape == (cfg.num_layers, b, cfg.num_heads, k, k)
    # early-guide: decoder length includes the object token
    assert dec.shape == (cfg.num_layers, b * k, cfg.num_heads, t + 1, t + 1)
    # rows are attention distributions
    np.testing.assert_allclose(np.asarray(enc).sum(-1), 1.0, rtol=2e-4)
