import time
import numpy as np, jax, jax.numpy as jnp
from spacap3d_tpu.ops.fps import furthest_point_sample_xla
from spacap3d_tpu.ops.fps_pallas import furthest_point_sample_pallas

def timeit_varied(fn, base, npoint, n=6):
    # vary inputs per call to defeat any execution caching in the tunnel
    variants = [base + jnp.float32(i) * 1e-3 for i in range(n)]
    out = fn(variants[0], npoint); jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(v, npoint) for v in variants]
    jax.block_until_ready(outs)
    return (time.perf_counter()-t0)/n

rng = np.random.RandomState(0)
xyz = jnp.asarray(rng.rand(8, 40000, 3).astype(np.float32) * 6)
small = jnp.asarray(rng.rand(8, 1024, 3).astype(np.float32) * 6)

got = np.asarray(furthest_point_sample_pallas(xyz, 2048))
want = np.asarray(furthest_point_sample_xla(xyz, 2048))
print("match 40k->2048:", np.array_equal(got, want), float((got!=want).mean()))
print("pallas 40k->2048:", timeit_varied(furthest_point_sample_pallas, xyz, 2048))
print("xla    40k->2048:", timeit_varied(furthest_point_sample_xla, xyz, 2048))
print("pallas 1024->256:", timeit_varied(furthest_point_sample_pallas, small, 256))
print("xla    1024->256:", timeit_varied(furthest_point_sample_xla, small, 256))
