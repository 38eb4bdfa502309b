"""Time the full MViT-base forward, same scalar-fetch methodology (scratch)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.models.mvit import MViT, MViTConfig

B = 64
cfg = MViTConfig.base(compute_dtype=jnp.bfloat16)
model = MViT(cfg, input_hw=(128, 1024), in_chans=1, final_norm=False)
x = jnp.asarray(np.random.default_rng(0).standard_normal((B, 128, 1024, 1)), jnp.float32)
variables = jax.jit(lambda: model.init(jax.random.key(0), x, False))()

fwd = jax.jit(lambda v, x: jnp.sum(model.apply(v, x, False).astype(jnp.float32)))
r = fwd(variables, x); float(r)
t0 = time.perf_counter()
for _ in range(20):
    r = fwd(variables, x)
float(r)
dt = (time.perf_counter() - t0) / 20 * 1e3
print(f"MViT-base fwd B={B}: {dt:.2f} ms  ({B/dt*1e3:.0f} clips/s)", flush=True)
