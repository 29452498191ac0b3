import time, functools
import jax, jax.numpy as jnp, numpy as np
print("default_backend:", jax.default_backend())
print("platform of device:", jax.devices()[0].platform)
from spacap3d_tpu import ops
from spacap3d_tpu.models import backbone as bb
import jax.random as jr

def timeit(fn, args_list):
    out = fn(*args_list[0]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list[1:]]
    jax.block_until_ready(outs)
    return (time.perf_counter()-t0)/(len(args_list)-1)

B, N = 8, 40000
rng = np.random.RandomState(0)
xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 6)
feats = jnp.asarray(rng.rand(B, N, 4).astype(np.float32))

disp = jax.jit(functools.partial(ops.furthest_point_sample, npoint=2048))
print("dispatched FPS:", timeit(disp, [(xyz + i*1e-3,) for i in range(6)]))

# sa1 with precomputed inds (isolates FPS from the rest)
cfg1 = bb.SAConfig(2048, 0.2, 64, [4, 64, 64, 128])
p1, s1 = bb.init_sa_module(jr.PRNGKey(1), cfg1)
inds = ops.furthest_point_sample_pallas(xyz, 2048)
sa1_noFPS = jax.jit(lambda x, f, i: bb.sa_module(p1, s1, cfg1, x, f, False, inds=i)[1])
print("sa1 w/ precomputed inds:", timeit(sa1_noFPS, [(xyz + i*1e-3, feats, inds) for i in range(6)]))
