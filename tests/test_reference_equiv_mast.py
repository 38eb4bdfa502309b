"""Whole-trainer equivalence for SS-MAST vs the ACTUAL reference code.

Completes the VERDICT r2 item-2 family (delores_s/m, slicer, unfused,
decar in test_reference_equiv.py) for the transformer objective. Two
pieces of real reference code run here, unmodified:

  * the trainer — ``Moco_v2`` imported from
    /root/reference/src/upstream/ssmast/upstream_expert.py (momentum key
    encoder updated inside forward — twice per training step — queue
    dequeue/enqueue + pointer, symmetric InfoNCE over both view orders,
    AdamW via its own configure_optimizers), with the real
    ``adjust_moco_momentum`` cosine schedule loaded from
    extras/mast_new/mast/utils.py;
  * the encoder trunk — the vendored MViTv2 (``mvit/models/mvit_model.py``
    + ``attention.py`` + ``common.py``), instantiated through its own
    constructor and given the same patch-embed surgery the reference
    itself performs (a 1-channel 16x16 conv at stride (10,10) replacing
    the square-image patchify, src/encoder/mast.py:104-107).

Because the reference stack builds its MAST trunk via
``timm.create_model('mvitv2_base')`` (src/encoder/mast.py:83) and timm is
not installed in this sandbox, the thin glue that the reference keeps in
``models_msn.AudioNTT2020`` / the MAST forward — input transpose, patchify,
block loop, token mean-pool (skipping the final norm), Linear(d->256)
head — is transcribed in the test shim below with line citations
(src/encoder/mast.py:184-231, models_msn.py:137-190). Every numerical
component (attention, pooling, MLP, rel-pos, trainer dynamics, optimizer)
is the reference's own code.

Geometry note: the vendored MultiScaleAttention asserts a SQUARE token
grid at construction (attention.py:210 ``assert input_size[0] ==
input_size[1]``) — it is used upstream for square ImageNet crops — so this
test runs a square 86x86 fbank (8x8 patch grid — a grid the
vendored floor-division size schedule halves cleanly: 8 -> 4 -> 2 -> 1). Rectangular freq-major
grids are separately pinned by tests/test_torch_import.py's full-model
MAST parity.

Both sides start from transplanted identical weights (our
``mast_to_torch`` export bridge — the same one users get) and an identical
initial queue; 24 steps of matched AdamW must produce matching loss
trajectories, queue contents, pointers, and momentum-encoder drift. The
default batched-views fast path is then pinned against the same reference
trajectory (it folds the two per-pass EMA steps into one double
application, which runs the first view order's keys half an EMA step
early — exact at step 0, percent-level loss-value deviation once the key
encoder trails; see objectives/ssmast.py).
"""
import importlib.util
import os
import sys
import types
from collections import OrderedDict
from types import SimpleNamespace

import numpy as np
import pytest

from tests.test_reference_equiv import _install_reference, _view_batches

REFERENCE = "/root/reference"
MVIT_DIR = os.path.join(REFERENCE, "extras", "mast_new", "mast", "models", "mvit")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MVIT_DIR), reason="reference checkout not present"
)


def _exec_as(name: str, path: str):
    """Execute a real reference file under a dotted module name (so its
    absolute/relative `mvit.*` imports resolve against our stub package)."""
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _install_vendored_mvit(monkeypatch):
    """Import the REAL vendored MViT model files. Only their non-numeric
    externals are stubbed: fvcore's registry (class decoration), the
    checkpoint-wrapper validator, and the logger factory."""
    import logging as std_logging

    pkg = types.ModuleType("mvit")
    pkg.__path__ = []  # mark as package
    models_pkg = types.ModuleType("mvit.models")
    models_pkg.__path__ = []
    utils_pkg = types.ModuleType("mvit.utils")
    utils_pkg.__path__ = []

    log_stub = types.ModuleType("mvit.utils.logging")
    log_stub.get_logger = std_logging.getLogger
    misc_stub = types.ModuleType("mvit.utils.misc")
    misc_stub.validate_checkpoint_wrapper_import = lambda *a, **k: None

    class _Registry:
        def register(self):
            return lambda cls: cls

    build_stub = types.ModuleType("mvit.models.build")
    build_stub.MODEL_REGISTRY = _Registry()

    for name, mod in (
        ("mvit", pkg),
        ("mvit.models", models_pkg),
        ("mvit.utils", utils_pkg),
        ("mvit.utils.logging", log_stub),
        ("mvit.utils.misc", misc_stub),
        ("mvit.models.build", build_stub),
    ):
        monkeypatch.setitem(sys.modules, name, mod)

    common = _exec_as("mvit.models.common", os.path.join(MVIT_DIR, "models", "common.py"))
    attention = _exec_as(
        "mvit.models.attention", os.path.join(MVIT_DIR, "models", "attention.py")
    )
    mvit_model = _exec_as(
        "mvit.models.mvit_model", os.path.join(MVIT_DIR, "models", "mvit_model.py")
    )
    # registered under real dotted names; ensure monkeypatch removes them too
    for name in ("mvit.models.common", "mvit.models.attention", "mvit.models.mvit_model"):
        monkeypatch.setitem(sys.modules, name, sys.modules[name])
    return common, attention, mvit_model


def _tiny_cfg(grid: int = 8):
    """The MViTv2-T schedule (extras/mast_new/mast/configs/MVITv2_T.yaml)
    as the attribute tree mvit_model.MViT.__init__ reads. TRAIN_CROP_SIZE /
    PATCH_STRIDE are chosen so patch_dims == [grid, grid]; the patch embed
    itself is replaced after construction (the reference's own surgery
    pattern), so only the grid size matters here. DROPPATH_RATE is 0 for
    determinism (both sides)."""
    stride = 9
    return SimpleNamespace(
        DATA=SimpleNamespace(TRAIN_CROP_SIZE=stride * grid, TEST_CROP_SIZE=stride * grid),
        MODEL=SimpleNamespace(
            NUM_CLASSES=10, ACT_CHECKPOINT=False, DROPOUT_RATE=0.0, HEAD_ACT="softmax"
        ),
        MVIT=SimpleNamespace(
            MODE="conv",
            POOL_FIRST=False,
            CLS_EMBED_ON=False,
            PATCH_KERNEL=(16, 16),
            PATCH_STRIDE=(stride, stride),
            PATCH_PADDING=(0, 0),
            EMBED_DIM=96,
            NUM_HEADS=1,
            MLP_RATIO=4.0,
            QKV_BIAS=True,
            DROPPATH_RATE=0.0,
            DEPTH=10,
            DIM_MUL=[[1, 2.0], [3, 2.0], [8, 2.0]],
            HEAD_MUL=[[1, 2.0], [3, 2.0], [8, 2.0]],
            POOL_KV_STRIDE=None,
            POOL_KV_STRIDE_ADAPTIVE=[4, 4],
            POOL_Q_STRIDE=[
                [0, 1, 1], [1, 2, 2], [2, 1, 1], [3, 2, 2], [4, 1, 1],
                [5, 1, 1], [6, 1, 1], [7, 1, 1], [8, 2, 2], [9, 1, 1],
            ],
            POOL_KVQ_KERNEL=[3, 3],
            ZERO_DECAY_POS_CLS=False,
            USE_ABS_POS=False,
            REL_POS_SPATIAL=True,
            REL_POS_ZERO_INIT=False,
            RESIDUAL_POOLING=True,
            DIM_MUL_IN_ATT=True,
        ),
    )


def _make_torch_encoder_cls(mvit_model):
    """models_msn.AudioNTT2020 stand-in: vendored-MViT trunk + Linear head.

    __init__ mirrors models_msn.py:137-173 (ast_model trunk + mlp.fc1) with
    the patch-embed replacement of src/encoder/mast.py:104-107; forward
    mirrors src/encoder/mast.py:184-231 (transpose so the patch grid is
    freq-major, patchify, block loop with thw, mean over tokens, final norm
    skipped) and models_msn.py:177-180 (float head)."""
    import torch
    import torch.nn as nn

    class _MASTTrunk(nn.Module):
        def __init__(self):
            super().__init__()
            self.v = mvit_model.MViT(_tiny_cfg())
            # the reference's own surgery: a fresh 1-channel patch conv at
            # the fbank strides replaces the square-image patchify
            self.v.patch_embed = mvit_model.PatchEmbed(
                dim_in=1, dim_out=96, kernel=(16, 16), stride=(10, 10), padding=(0, 0)
            )

        def forward(self, x, patch_drop=0.0):
            x = x.transpose(2, 3)  # [B,1,T,F] -> [B,1,F,T] (mast.py:191)
            x, shp = self.v.patch_embed(x)
            thw = [shp[-2], shp[-1]]
            for blk in self.v.blocks:
                x, thw = blk(x, thw)
            return x.mean(1)  # no cls token; self.v.norm skipped (mast.py:227-229)

    class AudioNTT2020(nn.Module):
        def __init__(self, out_dim, use_bn=False, norm_last_layer=True, n_layers=3,
                     hidden_dim=512, n_mels=64, d=768, output_dim=256):
            super().__init__()
            self.ast_model = _MASTTrunk()
            self.mlp = torch.nn.Sequential(
                OrderedDict([("fc1", torch.nn.Linear(d, output_dim))])
            )

        def forward(self, batch, return_before_head=False):
            z = self.ast_model(batch, patch_drop=0.0)
            return self.mlp(z.float())

    return AudioNTT2020


def _load_reference_moco(monkeypatch, encoder_cls):
    """src/upstream/ssmast/upstream_expert.py loaded standalone, with its
    flat imports seeded: the REAL extras utils (adjust_moco_momentum,
    off_diagonal, concat_all_gather, LARS), our encoder stand-in as
    models_msn, and inert stubs for the unused models_delores /
    contrastive_loss."""
    _install_reference(monkeypatch)  # pytorch_lightning + librosa shims

    utils_mod = _exec_as(
        "utils", os.path.join(REFERENCE, "extras", "mast_new", "mast", "utils.py")
    )
    monkeypatch.setitem(sys.modules, "utils", utils_mod)

    msn_stub = types.ModuleType("models_msn")
    msn_stub.AudioNTT2020 = encoder_cls
    delores_stub = types.ModuleType("models_delores")
    delores_stub.AudioNTT2020Task6 = type("AudioNTT2020Task6", (), {})
    monkeypatch.setitem(sys.modules, "models_msn", msn_stub)
    monkeypatch.setitem(sys.modules, "models_delores", delores_stub)
    monkeypatch.setitem(sys.modules, "contrastive_loss", types.ModuleType("contrastive_loss"))

    expert_mod = _exec_as(
        "ref_ssmast_expert",
        os.path.join(REFERENCE, "src", "upstream", "ssmast", "upstream_expert.py"),
    )
    monkeypatch.setitem(sys.modules, "ref_ssmast_expert", expert_mod)
    return expert_mod.Moco_v2


def _our_config(batched_views: bool):
    return {
        "run": {"batch_size": 8},
        "pretrain": {
            "base_encoder": {"type": "MAST", "output_dim": 768, "return_all_layers": False},
            "model_size": "tiny",
            "compute_dtype": "f32",
            "droppath_rate": 0.0,
            "batched_views": batched_views,
            "contrastive_dim": 256,
            "num_negatives": 64,
            "encoder_momentum": 0.99,
            "momentum_total_epochs": 200,
            "softmax_temperature": 0.07,
            "steps_per_epoch": 6,
            "input": {"n_mels": 86, "target_length": 86},
        },
    }


N_STEPS, BATCH, NEGATIVES, STEPS_PER_EPOCH = 24, 8, 64, 6
LR, WD = 1e-3, 0.05


def _run_ours(batched_views: bool):
    import jax
    import jax.numpy as jnp
    import optax

    from audiossl_tpu.objectives.ssmast import SSMast
    from audiossl_tpu.train.optim import adamw_torch

    obj = SSMast(_our_config(batched_views), axis_name=None)
    dummy = jnp.zeros((BATCH, 86, 86, 1), jnp.float32)
    params, batch_stats, ssl = obj.init(jax.random.key(0), (dummy, dummy))
    tx = adamw_torch(LR, weight_decay=WD)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, ssl, opt_state, v1, v2):
        def loss_fn(p):
            return obj.loss(p, batch_stats, ssl, (v1, v2), jax.random.key(1), True, None)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), aux.ssl_state, opt_state, loss

    batches = _view_batches(6, BATCH, n_mels=86, frames=86)
    losses = []
    for i in range(N_STEPS):
        v1, v2 = batches[i % len(batches)]
        params, ssl, opt_state, loss = train_step(
            params, ssl, opt_state,
            jnp.asarray(v1)[..., None], jnp.asarray(v2)[..., None],
        )
        losses.append(float(loss))
    return np.asarray(losses), params, ssl


@pytest.mark.slow
def test_ssmast_trainer_matches_reference(monkeypatch):
    import torch

    import jax

    from audiossl_tpu.models.torch_export import mast_to_torch
    from audiossl_tpu.objectives.ssmast import SSMast

    _, _, mvit_model = _install_vendored_mvit(monkeypatch)
    encoder_cls = _make_torch_encoder_cls(mvit_model)
    Moco_v2 = _load_reference_moco(monkeypatch, encoder_cls)

    # ---- our trainer (reference-exact sequential passes) ---------------
    import jax.numpy as jnp

    obj = SSMast(_our_config(batched_views=False), axis_name=None)
    dummy = jnp.zeros((BATCH, 86, 86, 1), jnp.float32)
    params0, _, ssl0 = obj.init(jax.random.key(0), (dummy, dummy))

    # ---- the reference trainer, from the SAME weights + queue ----------
    expert = Moco_v2(
        None, emb_dim=256, num_negatives=NEGATIVES,
        softmax_temperature=0.07, learning_rate=LR, weight_decay=WD,
    )
    to_t = lambda v: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))  # noqa: E731

    trunk_sd = mast_to_torch({"params": params0["encoder"]["mast"]})
    missing, unexpected = expert.encoder_q.ast_model.v.load_state_dict(
        {k: to_t(v) for k, v in trunk_sd.items()}, strict=False
    )
    # our export carries the trunk the MAST forward uses; the vendored
    # module also owns a final norm + classification head that the MAST
    # forward skips (mast.py:227) — nothing else may be missing
    assert not unexpected, unexpected
    assert set(missing) == {
        "norm.weight", "norm.bias", "head.projection.weight", "head.projection.bias",
    }, missing
    with torch.no_grad():
        expert.encoder_q.mlp.fc1.weight.copy_(to_t(params0["encoder"]["mlp_fc1"]["kernel"]).T)
        expert.encoder_q.mlp.fc1.bias.copy_(to_t(params0["encoder"]["mlp_fc1"]["bias"]))
        expert.queue.copy_(to_t(ssl0.queue))
        expert.queue_ptr.zero_()
    expert.encoder_k.load_state_dict(expert.encoder_q.state_dict(), strict=True)
    for p in expert.encoder_k.parameters():
        p.requires_grad = False
    expert.train()
    opt = expert.configure_optimizers()  # the reference's own AdamW

    batches = _view_batches(6, BATCH, n_mels=86, frames=86)
    ref = []
    for i in range(N_STEPS):
        expert.trainer = SimpleNamespace(
            use_ddp=False, use_ddp2=False,
            current_epoch=i // STEPS_PER_EPOCH,
            datamodule=SimpleNamespace(name="audio"),
        )
        v1, v2 = batches[i % len(batches)]
        # dataset delivers [B, 1, T, F] (mast.py:189 docstring; unsqueeze
        # done by the loader); our side takes [B, F, T, 1]
        t1 = torch.from_numpy(np.swapaxes(v1, 1, 2)[:, None].copy())
        t2 = torch.from_numpy(np.swapaxes(v2, 1, 2)[:, None].copy())
        tloss = expert.training_step((t1, t2), i)
        opt.zero_grad()
        tloss.backward()
        opt.step()
        ref.append(float(tloss))
    ref = np.asarray(ref)

    ours, params, ssl = _run_ours(batched_views=False)
    rel = np.abs(ours - ref) / np.maximum(np.abs(ref), 1e-12)
    for i in (0, 1, 5, 11, 17, 23):
        print(f"step {i:2d}: ours {ours[i]:.4f}  ref {ref[i]:.4f}  rel {rel[i]:.2e}")
    print(f"max rel dev over {N_STEPS} steps: {rel.max():.2e} at step {rel.argmax()}")
    assert rel[0] < 1e-4, (ours[0], ref[0])
    assert rel.max() < 2e-2, (rel.max(), rel.argmax())

    # MoCo state parity: pointer position and queue contents (24 steps x
    # 2 enqueues x 8 keys wraps the 64-queue six times; every column
    # rewritten many times over)
    assert int(ssl.queue_ptr) == int(expert.queue_ptr) == (N_STEPS * 2 * BATCH) % NEGATIVES
    q_ours, q_ref = np.asarray(ssl.queue), expert.queue.detach().numpy()
    assert np.abs(q_ours - q_ref).max() < 5e-3, np.abs(q_ours - q_ref).max()

    # momentum (key) encoder towers drifted identically — including the
    # twice-per-step EMA semantics — compared tensor-by-tensor through the
    # same export bridge
    k_sd_ours = mast_to_torch({"params": ssl.params_k["mast"]})
    k_sd_ref = expert.encoder_k.ast_model.v.state_dict()
    for name, v in k_sd_ours.items():
        d = np.abs(np.asarray(v) - k_sd_ref[name].numpy()).max()
        assert d < 2e-3, (name, d)
    d_head = np.abs(
        np.asarray(ssl.params_k["mlp_fc1"]["kernel"]).T
        - expert.encoder_k.mlp.fc1.weight.detach().numpy()
    ).max()
    assert d_head < 2e-3, d_head

    # the default batched-views fast path (one concat query pass + one
    # concat key pass, both EMA steps folded up front) must track the same
    # reference trajectory. The fold runs the first view order's keys half
    # an EMA step early — (1-m) x one optimizer step of parameter drift,
    # amplified by depth and the 1/temperature logit scale — so once
    # params_k trails params (step >= 1) the loss VALUE deviates at the
    # percent level while the gradient signal and carried state are
    # unchanged (objectives/ssmast.py). Step 0 is exact (EMA from a fresh
    # init is a no-op); the trajectory must stay within coarse tracking.
    fast, _, _ = _run_ours(batched_views=True)
    rel_fast = np.abs(fast - ref) / np.maximum(np.abs(ref), 1e-12)
    print(f"batched-views max rel dev: {rel_fast.max():.2e} at step {rel_fast.argmax()}")
    assert rel_fast[0] < 1e-4, (fast[0], ref[0])
    assert rel_fast.max() < 0.2, (rel_fast.max(), rel_fast.argmax())
