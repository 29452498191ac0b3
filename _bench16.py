import time, json
import jax, jax.numpy as jnp, numpy as np
from spacap3d_tpu.config import ModelConfig
from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
from spacap3d_tpu.models import init_spacap
from spacap3d_tpu.models.spacap import apply_spacap

for BS in (16, 32):
    cfg = ModelConfig(num_points=40000, vocab_size=4528)
    dc = ScannetDatasetConfig()
    params, state = init_spacap(jax.random.PRNGKey(0), cfg, dc.mean_size_arr)
    rng = np.random.RandomState(0)
    pts = rng.rand(BS, cfg.num_points, 3).astype(np.float32) * 6.0
    height = pts[..., 2:3]
    pc = jnp.asarray(np.concatenate([pts, height], -1))

    @jax.jit
    def fwd(params, state, pc):
        ep, _ = apply_spacap(params, state, cfg, {"point_clouds": pc},
                             is_eval=True, train=False)
        return ep["lang_cap"], ep["bbox_corner"]

    out = fwd(params, state, pc); jax.block_until_ready(out)
    n = 6
    variants = [pc + jnp.float32(i)*1e-3 for i in range(n)]
    jax.block_until_ready(variants)
    t0 = time.perf_counter()
    outs = [fwd(params, state, v) for v in variants]
    jax.block_until_ready(outs)
    dt = (time.perf_counter()-t0)/n
    print(f"B={BS}: {dt*1000:.1f} ms/batch -> {BS/dt:.1f} scenes/sec")
