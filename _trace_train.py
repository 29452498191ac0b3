import jax, jax.numpy as jnp, numpy as np
from spacap3d_tpu.config import ModelConfig, TrainConfig
from spacap3d_tpu.data.scannet_config import ScannetDatasetConfig
from spacap3d_tpu.data.synthetic import synthetic_batch
from spacap3d_tpu.models import init_spacap
from spacap3d_tpu.train.step import init_train_state, make_optimizer, make_train_step

cfg = ModelConfig(num_points=40000, vocab_size=4528)
tc = TrainConfig(batch_size=8)
dc = ScannetDatasetConfig()
params, state = init_spacap(jax.random.PRNGKey(0), cfg, dc.mean_size_arr)
batch, _, _ = synthetic_batch(cfg, batch_size=8, vocab_size=cfg.vocab_size)
batch = {k: jnp.asarray(v) for k, v in batch.items()}
tx = make_optimizer(params, tc, 4600)
ts = init_train_state(params, state, tx)
step = make_train_step(cfg, tc, tx, donate=False)
rng = jax.random.PRNGKey(0)
ts2, m = step(ts, batch, rng, 0.1); jax.block_until_ready(m["loss"])
with jax.profiler.trace("/tmp/train_trace"):
    cur = ts
    for i in range(3):
        cur, m = step(cur, dict(batch, point_clouds=batch["point_clouds"] + jnp.float32(i)*1e-3), rng, 0.1)
    jax.block_until_ready(m["loss"])
print("done")
