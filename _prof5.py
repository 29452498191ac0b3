import time, functools
import jax, jax.numpy as jnp, numpy as np
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
inds = ops.furthest_point_sample_pallas(xyz, 2048)
V = [(xyz + i*1e-3, feats, inds) for i in range(6)]

f1 = jax.jit(lambda x, f, i: ops.ball_query(x, ops.gather_points(x, i), 0.2, 64))
print("gather+ballq:", timeit(f1, V))

def grouped(x, f, i):
    new_xyz = ops.gather_points(x, i)
    idx = ops.ball_query(x, new_xyz, 0.2, 64)
    gx = (ops.group_points(x, idx) - new_xyz[:, :, None, :]) / 0.2
    gf = ops.group_points(f, idx)
    return jnp.concatenate([gx, gf], axis=-1)
f2 = jax.jit(grouped)
print("gather+ballq+group:", timeit(f2, V))

cfg1 = bb.SAConfig(2048, 0.2, 64, [4, 64, 64, 128])
p1, s1 = bb.init_sa_module(jr.PRNGKey(1), cfg1)
def full(x, f, i):
    g = grouped(x, f, i)
    h, _ = bb.shared_mlp(p1["mlp_module"], s1["mlp_module"], g, False)
    return jnp.max(h, axis=2)
f3 = jax.jit(full)
print("full sa1 (precomp inds):", timeit(f3, V))
