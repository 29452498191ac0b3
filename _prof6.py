import time
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

cfg1 = bb.SAConfig(2048, 0.2, 64, [4, 64, 64, 128])
p1, s1 = bb.init_sa_module(jr.PRNGKey(1), cfg1)

def grouped(x, f, i):
    new_xyz = ops.gather_points(x, i)
    idx = ops.ball_query(x, new_xyz, 0.2, 64)
    gx = (ops.group_points(x, idx) - new_xyz[:, :, None, :]) / 0.2
    gf = ops.group_points(f, idx)
    return jnp.concatenate([gx, gf], axis=-1)

def full_barrier(x, f, i):
    g = grouped(x, f, i)
    g = jax.lax.optimization_barrier(g)
    h, _ = bb.shared_mlp(p1["mlp_module"], s1["mlp_module"], g, False)
    return jnp.max(h, axis=2)
print("sa1 with opt barrier:", timeit(jax.jit(full_barrier), V))

def full_flat(x, f, i):
    g = grouped(x, f, i)
    b, m, ns, c = g.shape
    g = jax.lax.optimization_barrier(g.reshape(b, m * ns, c))
    h, _ = bb.shared_mlp(p1["mlp_module"], s1["mlp_module"], g, False)
    return jnp.max(h.reshape(b, m, ns, -1), axis=2)
print("sa1 barrier+flat:", timeit(jax.jit(full_flat), V))
