"""AST-base fused vs XLA attention on TPU (scratch)."""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.models.ast import ASTConfig, ASTEncoder

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def timeit(fn, *args, iters=10):
    r = fn(*args); float(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(r)
    return (time.perf_counter() - t0) / iters * 1e3


x = jnp.asarray(np.random.default_rng(0).standard_normal((B, 128, 1024, 1)), jnp.float32)
variables = None
for mode in ("off", "auto"):
    enc = ASTEncoder(cfg=dataclasses.replace(ASTConfig.base(), fused_attention=mode))
    if variables is None:
        variables = jax.jit(lambda: enc.init(jax.random.key(0), x, False))()
    fwd = jax.jit(lambda v, xx: jnp.sum(enc.apply(v, xx, False)))
    loss = lambda v, xx: jnp.sum(enc.apply(v, xx, True))
    bwd = jax.jit(lambda v, xx: jax.tree.reduce(lambda a, l: a + jnp.sum(jnp.abs(l)), jax.grad(loss)(v, xx), 0.0))
    print(f"AST-base B={B} fused={mode}: fwd {timeit(fwd, variables, x):7.2f} ms   fwd+bwd {timeit(bwd, variables, x):7.2f} ms", flush=True)
