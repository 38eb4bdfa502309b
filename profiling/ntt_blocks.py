"""Marginal train-time cost of each AudioNTT block at B=256 (scratch).

Bounds what a block-2/3 fusion (a hypothetical sequel to ops/block1.py)
could buy the delores_s step before building anything: time fwd+bwd of
growing prefixes of the encoder (block1 fused as in training, then +block2,
+block3, +MLP) on one view.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiossl_tpu.models.audiontt import ConvBlock

B, T, F = 256, 96, 64
ITERS = 30


class Prefix(nn.Module):
    n_blocks: int = 3
    mlp: bool = False
    d: int = 2048
    remat23: bool = False  # jax.checkpoint blocks 2-3: recompute vs residuals

    @nn.compact
    def __call__(self, x, train=True):
        on_tpu = jax.default_backend() == "tpu"
        for i in range(self.n_blocks):
            cls = ConvBlock
            if self.remat23 and i > 0:
                cls = nn.remat(ConvBlock, static_argnums=(2,))
            x = cls(
                fused=on_tpu and i == 0, fused_interpret=not on_tpu,
                fused_dead_input_grad_ok=True,
            )(x, train)
        if self.mlp:
            b, t, f, c = x.shape
            x = x.reshape(b, t, f * c)
            x = nn.relu(nn.Dense(self.d, dtype=x.dtype)(x))
            x = nn.relu(nn.Dense(self.d, dtype=x.dtype)(x))
        return x


def bench(n_blocks, mlp, remat23=False):
    model = Prefix(n_blocks=n_blocks, mlp=mlp, remat23=remat23)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T, F, 1)), jnp.bfloat16
    )
    variables = jax.jit(lambda: model.init(jax.random.key(0), x, True))()
    params, bs = variables["params"], variables["batch_stats"]

    def loss(p, bstats):
        out, mut = model.apply(
            {"params": p, "batch_stats": bstats}, x, True, mutable=["batch_stats"]
        )
        return jnp.sum(out.astype(jnp.float32)), mut

    step = jax.jit(lambda p, bstats: jax.grad(loss, has_aux=True)(p, bstats))
    g, mut = step(params, bs)
    jax.tree.map(lambda a: None, g)
    float(jnp.sum(jax.tree.leaves(g)[0]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        g, mut = step(params, bs)
    float(jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    tag = f"blocks1-{n_blocks}" + ("+mlp" if mlp else "") + ("+remat23" if remat23 else "")
    print(f"{tag:24s} fwd+bwd B={B}: {dt:6.2f} ms", flush=True)
    return dt


if __name__ == "__main__":
    import sys

    if "remat" in sys.argv:
        bench(3, True)
        bench(3, True, remat23=True)
    else:
        t1 = bench(1, False)
        t2 = bench(2, False)
        t3 = bench(3, False)
        t4 = bench(3, True)
        print(
            f"marginal: block2 {t2 - t1:.2f} ms, block3 {t3 - t2:.2f} ms, "
            f"mlp {t4 - t3:.2f} ms (x2 views in the real step)",
            flush=True,
        )
