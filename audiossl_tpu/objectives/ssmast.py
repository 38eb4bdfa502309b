"""SS-MAST: MoCo contrastive pretraining of the MAST spectrogram transformer.

Reference behavior: src/upstream/ssmast/upstream_expert.py — query/key
MASTWithHead encoders (MViTv2 trunk + Linear(d -> 256), models_msn.py:167),
65536-key queue, symmetric InfoNCE (both view orders, each enqueueing,
training_step:316-340), key encoder updated with the cosine momentum
schedule m(e) = 1 - 0.5 (1 + cos(pi e / 200)) (1 - 0.99)
(extras/mast_new/mast/utils.py:55-57, applied with epoch+1) — applied
TWICE per training step, once inside each of the two forward calls
(upstream_expert.py:268) — AdamW.

The epoch for the momentum schedule derives from a step counter carried in
the SSL state and ``steps_per_epoch`` (config), keeping the loss pure.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax.core import FrozenDict

from audiossl_tpu.models.mast import MASTWithHead
from audiossl_tpu.objectives.api import LossAux, register
from audiossl_tpu.objectives.delores_m import info_nce, queue_update
from audiossl_tpu.ops.stats import l2_normalize


class MocoV3State(NamedTuple):
    params_k: Any
    queue: jax.Array
    queue_ptr: jax.Array
    step: jax.Array  # for the epoch-indexed momentum schedule


def cosine_momentum(epoch: jax.Array, base: float = 0.99, total_epochs: int = 200) -> jax.Array:
    return 1.0 - 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / total_epochs)) * (1.0 - base)


@register("ssmast")
class SSMast:
    def __init__(self, config: dict[str, Any], axis_name: str | None = "data"):
        pre = config["pretrain"]
        self.axis_name = axis_name
        self.emb_dim = int(pre.get("contrastive_dim", 256))
        self.num_negatives = int(pre.get("num_negatives", 65536))
        self.temperature = float(pre.get("softmax_temperature", 0.07))
        self.momentum_base = float(pre.get("encoder_momentum", 0.99))
        self.momentum_epochs = int(pre.get("momentum_total_epochs", 200))
        self.steps_per_epoch = int(pre.get("steps_per_epoch", 1000))
        # MAST uses LayerNorm (no cross-batch stats), so shuffle-BN is a
        # no-op numerically; the flag exists for interface uniformity
        self.shuffle_bn = bool(pre.get("shuffle_bn", False))
        # encode concat([v1, v2]) / concat([v2, v1]) in one query / key pass
        # (exact for the LayerNorm-only MAST; see loss); False restores the
        # reference's four sequential passes
        self.batched_views = bool(pre.get("batched_views", True))
        # A sequential microbatches per optimizer step (train/accum.py
        # rationale): the memory lever for reference batch sizes (256-1024,
        # extras/mast_new/mast/1024_pretrain.sh) on a 16 GB v5e — cheaper
        # than remat (no recompute; PERF.md). Queue-negative InfoNCE is
        # per-sample-decomposable and keys carry no gradient, so loss,
        # grads, and carried MoCo state are EXACT for both view paths; see
        # value_and_grad.
        self.grad_accum = max(1, int(pre.get("grad_accum_steps", 1)))
        if self.grad_accum > 1 and self.shuffle_bn:
            # shuffle-BN is a numeric no-op for the LayerNorm-only MAST
            # (no cross-sample stats); refuse the combination rather than
            # silently dropping the permutation inside the microbatch scan
            raise ValueError("pretrain.grad_accum_steps > 1 is incompatible with shuffle_bn")
        inp = pre["input"]
        self.encoder = MASTWithHead(
            output_dim=self.emb_dim,
            input_fdim=int(inp.get("n_mels", 128)),
            input_tdim=int(inp.get("target_length", 1024)),
            model_size=str(pre.get("model_size", "base")),
            remat=bool(pre.get("remat", False)),  # MODEL.ACT_CHECKPOINT
            # "bf16" (default) | "f32" exact trunk
            compute_dtype=None if pre.get("compute_dtype") == "f32" else jnp.bfloat16,
            # MVIT.DROPPATH_RATE override; None keeps the variant default
            droppath_rate=pre.get("droppath_rate"),
            # forced to "off" by the pretrain.tp wiring (GSPMD cannot
            # partition the Pallas attention kernel, parallel/tp_mvit.py)
            fused_attention=str(pre.get("fused_attention", "auto")),
            # forced to "unrolled" under tp (grouped-conv filter-grad SPMD
            # hazard, models/mvit.py:_UnrolledDepthwise)
            pool_impl=str(pre.get("pool_impl", "conv")),
        )

    def init(self, key: jax.Array, sample_views):
        kp, kd, kq = jax.random.split(key, 3)
        variables = self.encoder.init({"params": kp, "dropout": kd}, sample_views[0], False)
        params = {"encoder": variables["params"]}
        batch_stats = {"encoder": variables.get("batch_stats", FrozenDict())}
        queue = jax.random.normal(kq, (self.emb_dim, self.num_negatives))
        queue = queue / jnp.linalg.norm(queue, axis=0, keepdims=True)
        ssl = MocoV3State(
            params_k=jax.tree.map(jnp.copy, params["encoder"]),
            queue=queue,
            queue_ptr=jnp.zeros((), jnp.int32),
            step=jnp.zeros((), jnp.int32),
        )
        return params, batch_stats, ssl

    def _encode(self, params, v, key, train):
        return self.encoder.apply({"params": params}, v, train, rngs={"dropout": key})

    def loss(self, params, batch_stats, ssl_state: MocoV3State, views, key, train=True, axis_name=None):
        v1, v2 = views[:2]
        keys = jax.random.split(key, 4)

        epoch = ssl_state.step // self.steps_per_epoch
        m = cosine_momentum((epoch + 1).astype(jnp.float32), self.momentum_base, self.momentum_epochs)
        # The reference applies the EMA inside forward(), and training_step
        # calls forward() twice (once per view order) — so the key encoder
        # takes TWO momentum steps per training step: the first key pass
        # sees one EMA application, the second sees two
        # (upstream_expert.py:268 via :327-328).
        ema = lambda pk: jax.tree.map(  # noqa: E731
            lambda a, b: m * a + (1.0 - m) * jax.lax.stop_gradient(b),
            pk,
            params["encoder"],
        )

        queue, ptr = ssl_state.queue, ssl_state.queue_ptr
        if self.batched_views and not (self.shuffle_bn and axis_name is not None):
            # Batched-views fast path: MAST is LayerNorm-only (no cross-
            # sample stats), so encoding concat([v1, v2]) in ONE query pass
            # and concat([v2, v1]) in ONE key pass reproduces the
            # reference's four sequential passes (upstream_expert.py:316-340)
            # while halving pass count — the MViT pooled pyramid is
            # small-matmul-bound at v5e batch sizes, so per-pass batch is
            # what fills the MXU (PERF.md). The queue stays sequential: the
            # second InfoNCE's negatives include the first view-order's
            # keys, exactly as in the loop below. The only fold: both EMA
            # steps are applied up front, so the first view order's keys
            # see the key encoder half an EMA step (~(1-m) x one optimizer
            # step of parameter drift) early. The carried state and all
            # gradients-through-queries are unchanged, but the loss VALUE
            # deviates a few percent per step once params_k trails params
            # (depth + the 1/temperature scale amplify the tiny weight
            # perturbation) — measured against the actual reference trainer
            # in tests/test_reference_equiv_mast.py. The sequential path
            # below is reference-exact; set batched_views: false for
            # bit-level reference parity.
            params_k = ema(ema(ssl_state.params_k))
            kq, kk = keys[0], keys[1]
            b = v1.shape[0]
            q12 = l2_normalize(
                self._encode(params["encoder"], jnp.concatenate([v1, v2]), kq, train), axis=1
            )
            k21 = jax.lax.stop_gradient(
                l2_normalize(self._encode(params_k, jnp.concatenate([v2, v1]), kk, train), axis=1)
            )
            total = info_nce(q12[:b], k21[:b], queue, self.temperature)
            queue, ptr = queue_update(queue, ptr, k21[:b], axis_name)
            total = total + info_nce(q12[b:], k21[b:], queue, self.temperature)
            queue, ptr = queue_update(queue, ptr, k21[b:], axis_name)
            new_ssl = MocoV3State(params_k=params_k, queue=queue, queue_ptr=ptr, step=ssl_state.step + 1)
            metrics = {"train_loss": total, "moco_momentum": m}
            return total, LossAux(batch_stats=batch_stats, ssl_state=new_ssl, metrics=metrics)

        total = 0.0
        params_k = ssl_state.params_k
        for i, (vq, vk) in enumerate(((v1, v2), (v2, v1))):
            # reference-exact: one EMA application per forward pass
            params_k = ema(params_k)
            q = l2_normalize(self._encode(params["encoder"], vq, keys[2 * i], train), axis=1)
            inv = None
            if self.shuffle_bn and axis_name is not None:
                from audiossl_tpu.objectives.delores_m import batch_shuffle, batch_unshuffle

                kk = jax.random.fold_in(keys[2 * i + 1], 17)
                kk = jax.random.wrap_key_data(jax.lax.pmax(jax.random.key_data(kk), axis_name))
                vk, inv = batch_shuffle(vk, kk, axis_name)
            k = self._encode(params_k, vk, keys[2 * i + 1], train)
            if inv is not None:
                from audiossl_tpu.objectives.delores_m import batch_unshuffle

                k = batch_unshuffle(k, inv, axis_name)
            k = jax.lax.stop_gradient(l2_normalize(k, axis=1))
            total = total + info_nce(q, k, queue, self.temperature)
            queue, ptr = queue_update(queue, ptr, k, axis_name)

        new_ssl = MocoV3State(params_k=params_k, queue=queue, queue_ptr=ptr, step=ssl_state.step + 1)
        metrics = {"train_loss": total, "moco_momentum": m}
        return total, LossAux(batch_stats=batch_stats, ssl_state=new_ssl, metrics=metrics)

    def value_and_grad(self, params, batch_stats, ssl_state: MocoV3State, views, key, train=True, axis_name=None):
        """((loss, aux), grads) — the step-level hook train/step.py prefers
        over plain ``jax.value_and_grad(loss)`` when an objective defines it.

        With ``pretrain.grad_accum_steps == 1`` this IS plain value_and_grad
        of :meth:`loss`. With A > 1 the per-chip batch is split into A
        microbatches run sequentially under ``lax.scan`` (one microbatch's
        activations live at a time; grads accumulate in f32), giving the
        reference's large-batch semantics (upstream_expert.py:316-340 at
        batch 256-1024) within a 16 GB chip without remat's recompute:

        Both paths are EXACT vs their monolithic counterpart (same loss,
        grads, queue slots, pointer, EMA tower — up to f32 summation order;
        tests/test_ssmast_accum.py):

        * ``batched_views: false`` — pass 1 applies one EMA step, scans all
          A microbatches against the step's initial queue, then bulk-enqueues
          all pass-1 keys (batch order preserved); pass 2 likewise. This is
          the reference's four-pass semantics at any A.
        * ``batched_views: true`` (default) — keys carry no gradient, so a
          first scan runs all A momentum-key concat passes and builds the
          two queue snapshots exactly as the monolithic fast path does
          (pass-1 InfoNCE vs the initial queue, pass-2 vs the post-pass-1
          queue); a second scan runs the query fwd+bwd per microbatch
          against those fixed snapshots. Total pass count is unchanged
          (one key fwd + one query fwd/bwd per sample) and only one
          microbatch's activations are ever live.

        Per-microbatch RNG is ``fold_in(key, pass*A + j)`` so dropout draws
        differ from the monolithic path (stochastic-train-only effect; with
        dropout off the paths are bit-identical up to summation order).
        """
        if self.grad_accum == 1:
            return jax.value_and_grad(
                lambda p: self.loss(p, batch_stats, ssl_state, views, key, train, axis_name),
                has_aux=True,
            )(params)

        accum = self.grad_accum
        v1, v2 = views[:2]
        b = v1.shape[0]
        if b % accum:
            raise ValueError(
                f"per-chip batch {b} not divisible by pretrain.grad_accum_steps {accum}"
            )
        mb = b // accum
        split = lambda v: v.reshape(accum, mb, *v.shape[1:])  # noqa: E731
        mv1, mv2 = split(v1), split(v2)
        mkeys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(2 * accum))

        epoch = ssl_state.step // self.steps_per_epoch
        m = cosine_momentum((epoch + 1).astype(jnp.float32), self.momentum_base, self.momentum_epochs)
        ema = lambda pk: jax.tree.map(  # noqa: E731
            lambda a, q: m * a + (1.0 - m) * jax.lax.stop_gradient(q), pk, params["encoder"]
        )
        g0 = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
        l0 = jnp.zeros((), jnp.float32)

        def acc(g_acc, gj):
            return jax.tree.map(lambda a, g: a + g.astype(jnp.float32) / accum, g_acc, gj)

        if self.batched_views:
            params_k = ema(ema(ssl_state.params_k))

            # phase 1 — momentum-key concat passes (keys carry no grads):
            # scanned so one microbatch's key activations are live at a time
            def key_body(_, xs):
                v1j, v2j, kj = xs
                _, kk = jax.random.split(kj)
                k21 = l2_normalize(
                    self._encode(params_k, jnp.concatenate([v2j, v1j]), kk, train), axis=1
                )
                return None, jax.lax.stop_gradient(k21)

            _, ks = jax.lax.scan(key_body, None, (mv1, mv2, mkeys[:accum]))  # [A, 2mb, d]
            # the monolithic fast path's two queue snapshots, built from the
            # bulk pass-1/pass-2 keys (microbatches are contiguous batch
            # slices, so reshape restores batch order)
            queue0 = ssl_state.queue
            q1, p1 = queue_update(queue0, ssl_state.queue_ptr, ks[:, :mb].reshape(b, -1), axis_name)
            queue, ptr = queue_update(q1, p1, ks[:, mb:].reshape(b, -1), axis_name)

            # phase 2 — query fwd+bwd per microbatch against the SAME fixed
            # snapshots the monolithic path uses (pass 1 vs queue0, pass 2
            # vs q1): loss/grads/state match it exactly, and total pass
            # count is unchanged (one key fwd + one query fwd/bwd per clip)
            def body(carry, xs):
                g_acc, loss_acc = carry
                v1j, v2j, kj, k21j = xs
                kq, _ = jax.random.split(kj)

                def mloss(p):
                    q12 = l2_normalize(
                        self._encode(p["encoder"], jnp.concatenate([v1j, v2j]), kq, train), axis=1
                    )
                    return info_nce(q12[:mb], k21j[:mb], queue0, self.temperature) + info_nce(
                        q12[mb:], k21j[mb:], q1, self.temperature
                    )

                lj, gj = jax.value_and_grad(mloss)(params)
                return (acc(g_acc, gj), loss_acc + lj / accum), None

            (grads, loss), _ = jax.lax.scan(body, (g0, l0), (mv1, mv2, mkeys[:accum], ks))
        else:
            queue, ptr = ssl_state.queue, ssl_state.queue_ptr
            params_k = ssl_state.params_k
            grads, loss = g0, l0
            for i, (vq_s, vk_s) in enumerate(((mv1, mv2), (mv2, mv1))):
                params_k = ema(params_k)  # one EMA application per pass, as in loss()
                fixed_queue = queue

                def body(carry, xs, params_k=params_k, fixed_queue=fixed_queue):
                    g_acc, loss_acc = carry
                    vqj, vkj, kj = xs
                    kq, kk = jax.random.split(kj)

                    def mloss(p):
                        q = l2_normalize(self._encode(p["encoder"], vqj, kq, train), axis=1)
                        k = jax.lax.stop_gradient(
                            l2_normalize(self._encode(params_k, vkj, kk, train), axis=1)
                        )
                        return info_nce(q, k, fixed_queue, self.temperature), k

                    (lj, kout), gj = jax.value_and_grad(mloss, has_aux=True)(params)
                    return (acc(g_acc, gj), loss_acc + lj / accum), kout

                (grads, loss), ks = jax.lax.scan(
                    body, (grads, loss), (vq_s, vk_s, mkeys[i * accum:(i + 1) * accum])
                )
                # bulk enqueue in batch order — exactly the reference's
                # single full-batch write after each pass
                queue, ptr = queue_update(queue, ptr, ks.reshape(b, -1), axis_name)

        grads = jax.tree.map(lambda g, p: g.astype(p.dtype), grads, params)
        new_ssl = MocoV3State(params_k=params_k, queue=queue, queue_ptr=ptr, step=ssl_state.step + 1)
        metrics = {"train_loss": loss, "moco_momentum": m}
        return (loss, LossAux(batch_stats=batch_stats, ssl_state=new_ssl, metrics=metrics)), grads

    def encoder_variables(self, params, batch_stats):
        # MAST trunk only (under the MASTWithHead wrapper)
        return {"params": params["encoder"]["mast"], "batch_stats": FrozenDict()}
