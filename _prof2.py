import time, functools, dataclasses
import jax, jax.numpy as jnp, numpy as np
from spacap3d_tpu import ops
from spacap3d_tpu.config import ModelConfig
from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
from spacap3d_tpu.models import init_spacap
from spacap3d_tpu.models.spacap import apply_spacap

def timeit(fn, args_list):
    out = fn(*args_list[0]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list[1:]]
    jax.block_until_ready(outs)
    return (time.perf_counter()-t0)/(len(args_list)-1)

B, N = 8, 40000
rng = np.random.RandomState(0)
def vary(base, n=6):
    return [(base + jnp.float32(i)*1e-3,) for i in range(n)]

xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 6)

bq = jax.jit(functools.partial(ops.ball_query, radius=0.2, nsample=64))
bq_wrap = lambda x: bq(x, x[:, :2048])
print("ballq sa1 (2048c x 40k):", timeit(bq_wrap, vary(xyz)))

cfg = ModelConfig(num_points=N, vocab_size=4528)
dc = ScannetDatasetConfig()
params, state = init_spacap(jax.random.PRNGKey(0), cfg, dc.mean_size_arr)
pts = rng.rand(B, N, 3).astype(np.float32) * 6
height = pts[..., 2:3]
base_pc = jnp.asarray(np.concatenate([pts, height], -1))

det_cfg = dataclasses.replace(cfg, no_caption=True)
@jax.jit
def detector_only(pc):
    ep, _ = apply_spacap(params, state, det_cfg, {"point_clouds": pc},
                         is_eval=False, train=False)
    return ep["center"], ep["aggregated_vote_features"]
print("detector fwd:", timeit(detector_only, vary(base_pc)))

@jax.jit
def full_eval(pc):
    ep, _ = apply_spacap(params, state, cfg, {"point_clouds": pc},
                         is_eval=True, train=False)
    return ep["lang_cap"]
print("detector+decode:", timeit(full_eval, vary(base_pc)))
