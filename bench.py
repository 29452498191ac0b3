"""Benchmark: full-evaluation throughput of the flagship model on TPU.

Measures scenes/sec of the evaluation forward pass — the detector trunk
(40,000 points -> 256 proposals) PLUS the greedy caption decode over all
256 proposals (31 steps, KV-cached lax.scan) at the reference workload
shape (batch 8, d_model 128, 6+6 transformer layers, vocab ~4.5k).

Baseline derivation (BASELINE.md): the reference's full `--mul_eval`
(100 seeds, caption + detection) takes ~4 h on an RTX 2080Ti
(README.md:42). Per seed it runs TWO full passes over the 141-scene
ScanRefer val split (caption eval and detection eval each re-run the
detector, scripts/eval.py:462-463): 100 * 2 * 141 = 28,200 scene
forwards / 14,400 s = 1.96 scenes/sec. Our eval produces captions and
detection outputs in ONE pass, so scenes/sec here is directly comparable
(conservatively: our pass always includes the 31-step decode, which the
reference's detection-only pass omits).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SCENES_PER_SEC = 28200 / (4 * 3600.0)  # 1.958


def main():
    from spacap3d_tpu.config import ModelConfig
    from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
    from spacap3d_tpu.models import init_spacap
    from spacap3d_tpu.models.spacap import apply_spacap
    from spacap3d_tpu.train.losses import get_scene_cap_loss

    cfg = ModelConfig(num_points=40000, vocab_size=4528)
    dc = ScannetDatasetConfig()
    params, state = init_spacap(jax.random.PRNGKey(0), cfg, dc.mean_size_arr)

    batch_size = 8
    rng = np.random.RandomState(0)
    # synthetic scene points: realistic extent, xyz + height feature
    pts = rng.rand(batch_size, cfg.num_points, 3).astype(np.float32) * 6.0
    pts[..., 2] *= 0.5
    height = pts[..., 2:3] - np.percentile(pts[..., 2], 0.99)
    point_clouds = jnp.asarray(np.concatenate([pts, height], -1))
    center_label = jnp.asarray(rng.rand(batch_size, 128, 3).astype(np.float32) * 6.0)

    @jax.jit
    def eval_forward(params, state, point_clouds, center_label):
        batch = {
            "point_clouds": point_clouds,
            "center_label": center_label,
            "heading_class_label": jnp.zeros((batch_size, 128), jnp.int32),
        }
        ep, _ = apply_spacap(
            params, state, cfg, batch, is_eval=True, train=False, rng=None
        )
        # detection side-outputs for matching (shared forward, one pass)
        ep = get_scene_cap_loss(
            dict(ep, box_label_mask=jnp.ones((batch_size, 128)),
                 box_label_mask_int=jnp.ones((batch_size, 128), jnp.int32),
                 heading_residual_label=jnp.zeros((batch_size, 128)),
                 size_class_label=jnp.zeros((batch_size, 128), jnp.int32),
                 size_residual_label=jnp.zeros((batch_size, 128, 3)),
                 sem_cls_label=jnp.zeros((batch_size, 128), jnp.int32),
                 vote_label=jnp.zeros((batch_size, cfg.num_points, 9)),
                 vote_label_mask=jnp.zeros((batch_size, cfg.num_points), jnp.int32),
                 ),
            params["mean_size_arr"], cfg.num_heading_bin, cfg.num_size_cluster,
            detection=True, caption=False, use_relation=False,
        )
        return (ep["lang_cap"], ep["bbox_corner"], ep["objectness_scores"],
                ep["sem_cls_scores"], ep["object_assignment"], ep["bbox_mask"])

    # warmup / compile
    out = eval_forward(params, state, point_clouds, center_label)
    jax.block_until_ready(out)

    # vary inputs per iteration (rules out any request-level caching in
    # remote-execution setups) and keep every output alive until the end
    n_iters = 10
    variants = [point_clouds + jnp.float32(i) * 1e-3 for i in range(n_iters)]
    jax.block_until_ready(variants)
    t0 = time.perf_counter()
    outs = [eval_forward(params, state, v, center_label) for v in variants]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    scenes_per_sec = batch_size * n_iters / dt
    print(json.dumps({
        "metric": "eval_scenes_per_sec_full_forward_plus_256way_greedy_decode",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/sec",
        "vs_baseline": round(scenes_per_sec / BASELINE_SCENES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
