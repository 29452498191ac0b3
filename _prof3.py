import time, functools
import jax, jax.numpy as jnp, numpy as np
from spacap3d_tpu import ops
from spacap3d_tpu.models import backbone as bb
from spacap3d_tpu.models import core

def timeit(fn, args_list):
    out = fn(*args_list[0]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list[1:]]
    jax.block_until_ready(outs)
    return (time.perf_counter()-t0)/(len(args_list)-1)

B, N = 8, 40000
rng = np.random.RandomState(0)
pts = jnp.asarray(rng.rand(B, N, 4).astype(np.float32))
idx = jnp.asarray(rng.randint(0, N, (B, 2048, 64)).astype(np.int32))

gp = jax.jit(ops.group_points)
print("group_points 40k->(2048,64) C=4:", timeit(gp, [(pts + i*1e-3, idx) for i in range(6)]))

pts128 = jnp.asarray(rng.rand(B, 2048, 128).astype(np.float32))
idx2 = jnp.asarray(rng.randint(0, 2048, (B, 1024, 32)).astype(np.int32))
print("group_points 2048->(1024,32) C=128:", timeit(gp, [(pts128 + i*1e-3, idx2) for i in range(6)]))

# shared MLP on grouped tensor
import jax.random as jr
p, s = bb.init_shared_mlp(jr.PRNGKey(0), [7, 64, 64, 128])
grouped = jnp.asarray(rng.rand(B, 2048, 64, 7).astype(np.float32))
mlp = jax.jit(lambda x: jnp.max(bb.shared_mlp(p, s, x, False)[0], axis=2))
print("sa1 mlp+pool:", timeit(mlp, [(grouped + i*1e-3,) for i in range(6)]))

# full sa1 module
cfg1 = bb.SAConfig(2048, 0.2, 64, [4, 64, 64, 128])
p1, s1 = bb.init_sa_module(jr.PRNGKey(1), cfg1)
xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 6)
feats = jnp.asarray(rng.rand(B, N, 4).astype(np.float32))
sa1 = jax.jit(lambda x, f: bb.sa_module(p1, s1, cfg1, x, f, False)[1])
print("sa1 full:", timeit(sa1, [(xyz + i*1e-3, feats) for i in range(6)]))

# fp module
pfp, sfp = bb.init_fp_module(jr.PRNGKey(2), [512, 256, 256])
un = jnp.asarray(rng.rand(B, 512, 3).astype(np.float32))
kn = jnp.asarray(rng.rand(B, 256, 3).astype(np.float32))
uf = jnp.asarray(rng.rand(B, 512, 256).astype(np.float32))
kf = jnp.asarray(rng.rand(B, 256, 256).astype(np.float32))
fp = jax.jit(lambda a,b,c,d: bb.fp_module(pfp, sfp, a,b,c,d, False)[0])
print("fp1:", timeit(fp, [(un + i*1e-3, kn, uf, kf) for i in range(6)]))
