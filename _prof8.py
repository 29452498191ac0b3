import time, functools, glob, collections
import jax, jax.numpy as jnp, numpy as np
from spacap3d_tpu import ops
from spacap3d_tpu.models import backbone as bb
import jax.random as jr

rng = np.random.RandomState(0)
B, N = 8, 40000
xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 6)
feats = jnp.asarray(rng.rand(B, N, 4).astype(np.float32))
inds = ops.furthest_point_sample_pallas(xyz, 2048)
cfg1 = bb.SAConfig(2048, 0.2, 64, [4, 64, 64, 128])
p1, s1 = bb.init_sa_module(jr.PRNGKey(1), cfg1)
sa1 = jax.jit(lambda p, s, x, f, i: bb.sa_module(p, s, cfg1, x, f, False, inds=i)[1])
out = sa1(p1, s1, xyz, feats, inds); jax.block_until_ready(out)
with jax.profiler.trace("/tmp/sa1e_trace"):
    for i in range(3):
        out = sa1(p1, s1, xyz + i*1e-3, feats, inds)
    jax.block_until_ready(out)
print("files:", glob.glob("/tmp/sa1e_trace/**/*.xplane.pb", recursive=True))
