"""One jitted, data-parallel SSL train step.

Fuses the whole per-step pipeline into a single XLA program per device:

    waveforms -> (l2-norm) -> log-mel frontend -> pre-norm + two augmented
    views -> objective loss -> grad psum -> optax update

replacing the reference's CPU dataloader-worker frontend + Lightning DDP hot
loop (SURVEY.md §3.1). Runs under `shard_map` over the 'data' mesh axis:
params/optimizer/SSL state replicated, batch + augmentation state sharded,
gradients pmean'd (DDP all-reduce equivalent), BN stats psum'd inside the
encoders (SyncBN equivalent).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audiossl_tpu.data.augment import AugmentPipeline
from audiossl_tpu.frontend import FrontendSpec
from audiossl_tpu.frontend.stft import LogMelConfig
from audiossl_tpu.ops.stats import l2_normalize
from audiossl_tpu.parallel.mesh import DATA_AXIS
from audiossl_tpu.train.state import TrainState


def _local(aug_state):
    """Strip the leading shard axis from augmentation state leaves."""
    return jax.tree.map(lambda a: a[0], aug_state)


def _global(aug_state):
    return jax.tree.map(lambda a: a[None], aug_state)


def as_frontend(cfg) -> FrontendSpec:
    if isinstance(cfg, FrontendSpec):
        return cfg
    if isinstance(cfg, LogMelConfig):
        return FrontendSpec(kind="logmel", n_mels=cfg.n_mels, sample_rate=cfg.sample_rate)
    raise TypeError(f"unsupported frontend config {type(cfg)}")


def prepare_views(
    pipeline: AugmentPipeline,
    mel_cfg,
    normalization: str,
    aug_state,
    waves: jax.Array,
    key: jax.Array,
):
    """waveforms [B, L] -> (aug_state', v1, v2) with views in NHWC [B, F, T, 1]."""
    frontend = as_frontend(mel_cfg)
    if waves.dtype == jnp.int16:  # PCM16 wire format (data/pipeline.py)
        waves = waves.astype(jnp.float32) / 32768.0
    if normalization == "l2":
        waves = l2_normalize(waves, axis=-1)
    if getattr(pipeline.cfg, "wave_mixup_rate", 0.0) > 0.0:
        from audiossl_tpu.frontend.fbank import batch_waveform_mixup

        key, k_wmix = jax.random.split(key)
        waves = batch_waveform_mixup(waves, k_wmix, pipeline.cfg.wave_mixup_rate)
    lms = frontend(waves)[:, None]  # [B, 1, F, T]
    aug_state, v1, v2 = pipeline(aug_state, lms, key)
    to_nhwc = lambda v: jnp.transpose(v, (0, 2, 3, 1))
    return aug_state, to_nhwc(v1), to_nhwc(v2)


def make_train_step(
    objective: Any,
    pipeline: AugmentPipeline,
    mel_cfg: LogMelConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    normalization: str = "mean_var",
    labeled: bool = False,
    axis: str = DATA_AXIS,
    zero: bool = False,
) -> Callable[[TrainState, jax.Array], tuple[TrainState, dict]]:
    """Build the jitted step. ``labeled`` passes per-clip labels through to the
    objective (UnFuSeD pseudo-label training, SURVEY.md §2.1). ``zero`` shards
    the optimizer state across the mesh (train/zero.py): grads reduce-scatter
    instead of pmean, moments live 1/n per chip, updates all_gather back."""
    mel_cfg = as_frontend(mel_cfg)
    n_shards = mesh.devices.size

    def step_fn(state: TrainState, waves: jax.Array, labels: jax.Array | None):
        key = jax.random.fold_in(state.rng, state.step)
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        k_aug, k_loss = jax.random.split(key)

        aug_state, v1, v2 = prepare_views(
            pipeline, mel_cfg, normalization, _local(state.aug_state), waves, k_aug
        )
        views = (v1, v2) if labels is None else (v1, v2, labels)

        # objectives may provide their own value_and_grad (SS-MAST's exact
        # gradient accumulation, objectives/ssmast.py) — the default is
        # plain jax.value_and_grad over the pure loss
        vg = getattr(objective, "value_and_grad", None)
        if vg is not None:
            (loss, aux), grads = vg(
                state.params, state.batch_stats, state.ssl_state, views, k_loss, True, axis
            )
        else:

            def loss_fn(params):
                return objective.loss(
                    params, state.batch_stats, state.ssl_state, views, k_loss, True, axis
                )

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if zero:
            from audiossl_tpu.train.zero import zero_update

            updates, opt_local = zero_update(
                tx, grads, _local(state.opt_state), state.params, n_shards, axis
            )
            opt_state = _global(opt_local)
        else:
            grads = jax.lax.pmean(grads, axis)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {k: jax.lax.pmean(v, axis) for k, v in aux.metrics.items()}

        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            batch_stats=aux.batch_stats,
            ssl_state=aux.ssl_state,
            aug_state=_global(aug_state),
            rng=state.rng,
        )
        return new_state, metrics

    state_specs = TrainState(
        step=P(),
        params=P(),
        opt_state=P(axis) if zero else P(),
        batch_stats=P(),
        ssl_state=P(),
        aug_state=P(axis),
        rng=P(),
    )
    sharded = shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(state_specs, P(axis), P(axis) if labeled else P()),
        out_specs=(state_specs, P()),
        check_vma=False,
    )

    # donate the carried state: params/optimizer/queue/memory-bank buffers
    # update in place instead of allocating a second copy every step (halves
    # state HBM footprint; lets XLA alias the big MoCo-queue scatter)
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, waves: jax.Array, labels: jax.Array | None = None):
        return sharded(state, waves, labels)

    if labeled:
        return train_step

    def unlabeled_step(state: TrainState, waves: jax.Array, labels=None):
        return train_step(state, waves, None)

    # expose the underlying jit for AOT lowering / cost analysis (bench MFU)
    unlabeled_step.jitted = train_step
    return unlabeled_step


def tp_state_shardings(state: TrainState, mesh: Mesh) -> TrainState:
    """TrainState-shaped pytree of NamedShardings for a tensor-parallel run.

    `parallel/tp_mvit.py:mvit_tp_specs` keys purely on tree paths, so one
    walk covers params, the EMA key tower inside the MoCo ssl_state, AND the
    Adam moments (whose trees mirror the param structure): every leaf under
    a ``block{i}`` component gets its Megatron spec, everything else
    (queue, counters, rng, scalars) is replicated over the whole mesh.
    """
    from audiossl_tpu.parallel.tp_mvit import mvit_tp_shardings

    return mvit_tp_shardings(state, mesh)


def make_train_step_gspmd(
    objective: Any,
    pipeline: AugmentPipeline,
    mel_cfg: LogMelConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    state_sh: TrainState,
    normalization: str = "precomputed",
    labeled: bool = False,
) -> Callable[[TrainState, jax.Array], tuple[TrainState, dict]]:
    """GSPMD train step: plain ``jax.jit`` + explicit state shardings.

    The sanctioned exception to the shard_map invariant (CLAUDE.md), shared
    by both whole-loop sharding strategies on the pretrain path:

    * ``pretrain.tp`` — ``state_sh = tp_state_shardings(state, mesh)`` over
      a ('data', 'model') mesh: every large encoder matrix in the query
      tower, the EMA key tower, and the Adam moments lives 1/tp per chip on
      the model axis (parallel/tp_mvit.py) while the batch rides data.
    * ``pretrain.fsdp`` — ``parallel.fsdp.tree_shardings(state, mesh)`` over
      the data mesh: params/grads/moments (and the MoCo queue) shard on
      their largest divisible dim; XLA inserts per-use all-gathers and grad
      reduce-scatters (ZeRO-3 semantics, parallel/fsdp.py).

    Under GSPMD the batch is ONE logical array, so the objective runs with
    ``axis_name=None``: per-sample means are already global means and MoCo
    queue enqueues already see every chip's keys — adding pmean/psum would
    double-count (parallel/fsdp.py's loss-function contract).

    Requires stateless augmentation (the mixup ring bank and RunningNorm
    carry shard-local state shaped for the shard_map step); the loop
    enforces that before calling. RNG differs benignly from the shard_map
    path: one global key per step instead of per-device fold_in — same
    distribution, different draws.

    ``state_sh`` is a TrainState-shaped pytree of NamedShardings; pass the
    actual initial state through ``jax.device_put(state, state_sh)`` before
    stepping.
    """
    mel_cfg = as_frontend(mel_cfg)
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def step_fn(state: TrainState, waves: jax.Array, labels: jax.Array | None):
        key = jax.random.fold_in(state.rng, state.step)
        k_aug, k_loss = jax.random.split(key)
        aug_state, v1, v2 = prepare_views(
            pipeline, mel_cfg, normalization, _local(state.aug_state), waves, k_aug
        )
        views = (v1, v2) if labels is None else (v1, v2, labels)
        vg = getattr(objective, "value_and_grad", None)
        if vg is not None:
            (loss, aux), grads = vg(
                state.params, state.batch_stats, state.ssl_state, views, k_loss, True, None
            )
        else:

            def loss_fn(params):
                return objective.loss(
                    params, state.batch_stats, state.ssl_state, views, k_loss, True, None
                )

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        # pin grads to the param layout so the Adam update (and its moments)
        # runs on 1/tp-sized shards per chip
        grads = jax.lax.with_sharding_constraint(grads, state_sh.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            batch_stats=aux.batch_stats,
            ssl_state=aux.ssl_state,
            aug_state=_global(aug_state),
            rng=state.rng,
        )
        return new_state, aux.metrics

    train_step = jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh, batch_sh if labeled else None),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
    if labeled:
        return train_step

    def unlabeled_step(state: TrainState, waves: jax.Array, labels=None):
        return train_step(state, waves, None)

    unlabeled_step.jitted = train_step
    return unlabeled_step


def init_train_state(
    objective: Any,
    pipeline: AugmentPipeline,
    mel_cfg: LogMelConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    key: jax.Array,
    local_batch: int,
    clip_samples: int,
    normalization: str = "mean_var",
    labeled: bool = False,
    zero: bool = False,
) -> TrainState:
    """Initialize params/state from a dummy batch (shapes only)."""
    mel_cfg = as_frontend(mel_cfg)
    n_shards = mesh.devices.size
    n_frames = mel_cfg.num_frames(clip_samples)
    aug_local = pipeline.init_state(mel_cfg.n_mels, n_frames)
    aug_state = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (n_shards,) + a.shape), aug_local
    )

    dummy = jnp.zeros((local_batch, mel_cfg.n_mels, n_frames, 1), jnp.float32)
    views = (dummy, dummy) if not labeled else (dummy, dummy, jnp.zeros((local_batch,), jnp.int32))
    k_init, k_rng = jax.random.split(key)
    # jit the init: eager flax init dispatches one op at a time, which is
    # minutes of round trips for MViT-base through a remote-device tunnel
    params, batch_stats, ssl_state = jax.jit(objective.init)(k_init, views)
    if zero:
        from audiossl_tpu.train.zero import zero_init

        opt_state = jax.jit(partial(zero_init, tx, n_shards=n_shards))(params)
    else:
        opt_state = tx.init(params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        batch_stats=batch_stats,
        ssl_state=ssl_state,
        aug_state=aug_state,
        rng=k_rng,
    )
    # Place on the mesh: aug state sharded along 'data', everything
    # replicated (multi-host-safe — parallel/mesh.py:host_to_mesh).
    from audiossl_tpu.parallel.mesh import host_to_mesh

    state = host_to_mesh(mesh, state._replace(aug_state=None, opt_state=None), P())._replace(
        aug_state=host_to_mesh(mesh, aug_state, P(DATA_AXIS)),
        opt_state=host_to_mesh(mesh, opt_state, P(DATA_AXIS) if zero else P()),
    )
    return state
