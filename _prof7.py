import time
import jax, jax.numpy as jnp, numpy as np

def timeit(fn, args_list):
    out = fn(*args_list[0]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list[1:]]
    jax.block_until_ready(outs)
    return (time.perf_counter()-t0)/(len(args_list)-1)

rng = np.random.RandomState(0)
a = jnp.asarray(rng.rand(8192, 8192).astype(np.float32))
mm = jax.jit(lambda x, y: x @ y)
print("8k matmul (1.1 TFLOP):", timeit(mm, [(a + i*1e-3, a) for i in range(6)]))

from spacap3d_tpu import ops
from spacap3d_tpu.models import backbone as bb
import jax.random as jr
B, N = 8, 40000
xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 6)
feats = jnp.asarray(rng.rand(B, N, 4).astype(np.float32))
inds = ops.furthest_point_sample_pallas(xyz, 2048)
cfg1 = bb.SAConfig(2048, 0.2, 64, [4, 64, 64, 128])
p1, s1 = bb.init_sa_module(jr.PRNGKey(1), cfg1)
sa1 = jax.jit(lambda p, s, x, f, i: bb.sa_module(p, s, cfg1, x, f, False, inds=i)[1])
for n in (2, 6, 11):
    print(f"sa1 n={n}:", timeit(sa1, [(p1, s1, xyz + i*1e-3, feats, inds) for i in range(n)]))
mlp = jax.jit(lambda p, s, x: jnp.max(bb.shared_mlp(p, s, x, False)[0], axis=2))
grouped = jnp.asarray(rng.rand(B, 2048, 64, 7).astype(np.float32))
for n in (2, 6):
    print(f"mlp n={n}:", timeit(mlp, [(p1["mlp_module"], s1["mlp_module"], grouped + i*1e-3) for i in range(n)]))
