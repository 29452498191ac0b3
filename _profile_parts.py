import time, functools
import jax, jax.numpy as jnp, numpy as np
from spacap3d_tpu import ops
from spacap3d_tpu.config import ModelConfig
from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
from spacap3d_tpu.models import init_spacap
from spacap3d_tpu.models.spacap import apply_spacap
from spacap3d_tpu.models import captioner as cap

def timeit(fn, *args, n=5):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n

B, N = 8, 40000
rng = np.random.RandomState(0)
xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 6)

fps = jax.jit(functools.partial(ops.furthest_point_sample_xla, npoint=2048))
print("FPS sa1 (2048 of 40k):", timeit(fps, xyz))
fps2 = jax.jit(functools.partial(ops.furthest_point_sample_xla, npoint=256))
v = jnp.asarray(rng.rand(B, 1024, 3).astype(np.float32) * 6)
print("FPS agg (256 of 1024):", timeit(fps2, v))

centers = xyz[:, :2048]
bq = jax.jit(functools.partial(ops.ball_query, radius=0.2, nsample=64))
print("ballq sa1:", timeit(bq, xyz, centers))
bq2 = jax.jit(functools.partial(ops.ball_query, radius=0.4, nsample=32))
print("ballq sa2:", timeit(bq2, centers, centers[:, :1024]))

cfg = ModelConfig(num_points=N, vocab_size=4528)
dc = ScannetDatasetConfig()
params, state = init_spacap(jax.random.PRNGKey(0), cfg, dc.mean_size_arr)
pts = rng.rand(B, N, 3).astype(np.float32) * 6
height = pts[..., 2:3] - np.percentile(pts[..., 2], 0.99)
batch = {"point_clouds": jnp.asarray(np.concatenate([pts, height], -1))}

@jax.jit
def detector_only(params, state, batch):
    import dataclasses
    c = dataclasses.replace(cfg, no_caption=True)
    ep, _ = apply_spacap({k: v for k, v in params.items() if k != "caption"},
                         {k: v for k, v in state.items() if k != "caption"},
                         c, batch, is_eval=False, train=False)
    return ep["center"], ep["aggregated_vote_features"], ep["bbox_corner"]
print("detector fwd:", timeit(detector_only, params, state, batch))

@jax.jit
def full_eval(params, state, batch):
    ep, _ = apply_spacap(params, state, cfg, batch, is_eval=True, train=False)
    return ep["lang_cap"]
print("detector+decode:", timeit(full_eval, params, state, batch))
