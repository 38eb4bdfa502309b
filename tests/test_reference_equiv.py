"""Whole-trainer equivalence vs the ACTUAL reference implementation.

VERDICT r2 item 2: every loss here is oracle-tested as a function, but
accuracy parity needs trainer-level evidence. This test imports the
reference's DeLoRes-S trainer (/root/reference/src/upstream/delores_s/
upstream_expert.py:191-243) and runs it — real `training_step`, real torch
SGD — side-by-side with our `DeloresS` objective for 48 steps:

  * identical weights (our flax init transplanted with
    models/torch_export.py, the same bridge users get);
  * identical synthetic log-mel view pairs every step (augmentations
    bypassed — they are independently oracle-tested; this isolates
    encoder+projector+loss+optimizer dynamics);
  * matched SGD (lr .03, momentum .9, wd 1e-4 — configure_optimizers
    defaults, upstream_expert.py:236-243) with dropout disabled on both
    sides (the only stochastic element; BN batch stats stay live);
  * f32 on both sides (`pretrain.base_encoder.compute_dtype` override).

Asserts the 48-step loss trajectories agree and that identical linear
probes on the two final encoders (eval mode, running BN stats) classify
held-out separable data identically.

Reference import shims (test-only, SURVEY.md §2.5): a minimal
pytorch_lightning.LightningModule stand-in (lightning is not installed
here; only save_hyperparameters/log_dict are touched) and an empty librosa
module (src.utils imports it at module level; no librosa code runs). The
reference encoder class is loaded from its file directly because
src/encoder/__init__.py imports timm at module level.
"""
import importlib.util
import inspect
import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "src")), reason="reference checkout not present"
)


def _install_reference(monkeypatch):
    import torch

    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            def save_hyperparameters(self, *a, **k):
                frame = inspect.currentframe().f_back
                hp = {
                    name: v
                    for name, v in frame.f_locals.items()
                    if name not in ("self", "args", "kwargs", "__class__")
                }
                object.__setattr__(self, "hparams", SimpleNamespace(**hp))

            def log_dict(self, *a, **k):
                pass

        pl.LightningModule = LightningModule
        monkeypatch.setitem(sys.modules, "pytorch_lightning", pl)
    try:
        import librosa  # noqa: F401
    except ImportError:
        monkeypatch.setitem(sys.modules, "librosa", types.ModuleType("librosa"))
    if REFERENCE not in sys.path:
        monkeypatch.syspath_prepend(REFERENCE)


def _load_reference_audiontt():
    """src/encoder/audiontt.py loaded standalone (the package __init__ pulls
    in timm via the MAST encoder)."""
    spec = importlib.util.spec_from_file_location(
        "ref_audiontt", os.path.join(REFERENCE, "src", "encoder", "audiontt.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.AudioNTT2020Task6


def _config():
    from audiossl_tpu.config import load_config

    config = load_config(None, "delores_s")
    config["pretrain"]["lambda_barlow"] = float(config["pretrain"]["lambda_barlow"])
    # exact-parity knobs: f32 compute, dropout off (both sides)
    config["pretrain"]["base_encoder"]["compute_dtype"] = "float32"
    config["pretrain"]["base_encoder"]["dropout"] = 0.0
    return config


def _view_batches(n_batches: int, batch: int, n_mels: int = 64, frames: int = 96):
    """Deterministic augmented-pair stand-ins: view2 = view1 + small noise,
    standardized like mean_var-normalized log-mels."""
    rng = np.random.default_rng(7)
    out = []
    for _ in range(n_batches):
        base = rng.standard_normal((batch, n_mels, frames)).astype(np.float32)
        noise = 0.3 * rng.standard_normal((batch, n_mels, frames)).astype(np.float32)
        out.append((base, (base + noise).astype(np.float32)))
    return out


def _probe_batches(n_classes: int, per_class: int, n_mels: int = 64, frames: int = 96):
    """Separable eval data: class-dependent mel-band energy bumps."""
    rng = np.random.default_rng(11)
    xs, ys = [], []
    for c in range(n_classes):
        x = 0.5 * rng.standard_normal((per_class, n_mels, frames)).astype(np.float32)
        band = slice(c * (n_mels // n_classes), (c + 1) * (n_mels // n_classes))
        x[:, band, :] += 2.0
        xs.append(x)
        ys.append(np.full((per_class,), c, np.int64))
    x, y = np.concatenate(xs), np.concatenate(ys)
    order = rng.permutation(len(y))
    return x[order], y[order]


def _dual_ridge_probe(train_x, train_y, test_x, test_y, lam=1e-2):
    """Closed-form (deterministic) linear probe in the dual: identical
    procedure applied to both frameworks' embeddings."""
    y = np.eye(train_y.max() + 1)[train_y]
    k = train_x @ train_x.T
    alpha = np.linalg.solve(k + lam * np.eye(len(train_x)), y)
    pred = (test_x @ train_x.T) @ alpha
    return float((pred.argmax(1) == test_y).mean())


@pytest.mark.slow
def test_delores_s_trainer_matches_reference(monkeypatch):
    import torch

    _install_reference(monkeypatch)
    from src.upstream.delores_s.upstream_expert import Upstream_Expert

    import jax
    import jax.numpy as jnp
    import optax

    from audiossl_tpu.models.audiontt import AudioNTT2020Task6, max_mean_pool
    from audiossl_tpu.models.torch_export import audiontt_to_torch, projection_to_torch
    from audiossl_tpu.objectives.delores_s import DeloresS
    from audiossl_tpu.train.optim import sgd_torch

    config = _config()
    n_steps, batch = 48, 32
    batches = _view_batches(6, batch)

    # ---- our trainer --------------------------------------------------
    obj = DeloresS(config, axis_name=None)
    dummy = jnp.zeros((batch, 64, 96, 1), jnp.float32)
    params, batch_stats, _ = obj.init(jax.random.key(0), (dummy, dummy))
    tx = sgd_torch(0.03, momentum=0.9, weight_decay=1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, v1, v2):
        def loss_fn(p):
            return obj.loss(p, batch_stats, (), (v1, v2), jax.random.key(1), True, None)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), aux.batch_stats, opt_state, loss

    # ---- the reference trainer, from the SAME weights ------------------
    expert = Upstream_Expert(config, _load_reference_audiontt())
    enc_sd = audiontt_to_torch(
        {"params": params["encoder"], "batch_stats": batch_stats["encoder"]}
    )
    expert.encoder.encoder.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in enc_sd.items()}, strict=True
    )
    proj_sd = projection_to_torch(params["projector"], batch_stats["projector"])
    expert.p.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in proj_sd.items()}, strict=True
    )
    for m in expert.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    expert.trainer = SimpleNamespace(datamodule=SimpleNamespace(name="audio"))
    expert.train()
    opt = torch.optim.SGD(expert.parameters(), lr=0.03, momentum=0.9, weight_decay=1e-4)

    ours, ref = [], []
    for i in range(n_steps):
        v1, v2 = batches[i % len(batches)]
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state,
            jnp.asarray(v1)[..., None], jnp.asarray(v2)[..., None],
        )
        ours.append(float(loss))

        t1 = torch.from_numpy(v1[:, None])  # [B, 1, F, T]
        t2 = torch.from_numpy(v2[:, None])
        tloss = expert.training_step((t1, t2), i)  # the real reference step
        opt.zero_grad()
        tloss.backward()
        opt.step()
        ref.append(float(tloss))

    ours, ref = np.asarray(ours), np.asarray(ref)
    rel = np.abs(ours - ref) / np.maximum(np.abs(ref), 1e-12)
    # trajectory of record for PARITY.md (run with -s to see)
    for i in (0, 1, 2, 11, 23, 35, 47):
        print(f"step {i:2d}: ours {ours[i]:.4f}  ref {ref[i]:.4f}  rel {rel[i]:.2e}")
    print(f"max rel dev over {n_steps} steps: {rel.max():.2e} at step {rel.argmax()}")
    # step 0 is pure transplant fidelity; later steps accumulate f32
    # op-ordering drift between XLA and torch
    assert rel[0] < 1e-4, (ours[0], ref[0])
    assert rel.max() < 2e-2, (rel.max(), rel.argmax())
    assert ref[-1] < ref[0] and ours[-1] < ours[0]  # both actually trained

    # ---- linear probe on the two final encoders -----------------------
    px, py = _probe_batches(4, 24)
    n_train = 64
    enc = AudioNTT2020Task6(n_mels=64, d=2048, compute_dtype=jnp.float32)

    @jax.jit
    def embed_ours(x):
        return max_mean_pool(
            enc.apply(
                {"params": params["encoder"], "batch_stats": batch_stats["encoder"]},
                x[..., None], False,
            )
        )

    emb_j = np.asarray(embed_ours(jnp.asarray(px)))
    expert.eval()
    with torch.no_grad():
        emb_t = expert.encoder(torch.from_numpy(px[:, None])).numpy()

    # the pooled eval embeddings must still agree: step-0 transplant
    # fidelity is 1e-4, but 48 steps of XLA-vs-torch op-ordering drift
    # compound through the weights AND the BN running stats the eval
    # forward uses, so post-training embeddings sit at the few-e-2 level
    # (measured 3.1e-2) — same order as the late-step loss deviation.
    scale = np.abs(emb_t).max()
    emb_rel = np.abs(emb_j - emb_t).max() / scale
    print(f"post-training eval embedding max rel diff: {emb_rel:.2e}")
    assert emb_rel < 5e-2, emb_rel

    acc_ours = _dual_ridge_probe(emb_j[:n_train], py[:n_train], emb_j[n_train:], py[n_train:])
    acc_ref = _dual_ridge_probe(emb_t[:n_train], py[:n_train], emb_t[n_train:], py[n_train:])
    assert acc_ours == acc_ref, (acc_ours, acc_ref)
    assert acc_ours > 0.9, acc_ours  # the probe task is separable


@pytest.mark.slow
def test_unfused_trainer_matches_reference(monkeypatch):
    """Same harness for UnFuSeD (src/upstream/unfused/upstream_expert.py:
    141-168): pseudo-label distillation — per-tap Project MLPs + pooled
    classifier, alpha-weighted CE + beta-weighted KL(student||classifier) +
    gamma-weighted cosine-MSE, full combined loss backpropped.

    Intent shim (test-only): src/upstream/unfused/upstream_encoder.py:17
    unpacks ``x, x_1, x_2, x_3 = self.encoder(x)`` against audiontt's
    ``return x_1, x_2, x_3, x`` (audiontt.py:100-101) — as written the
    pooled path max/means a 2-D tap into a [B] vector and every head gets a
    mis-sized input (immediate shape error). The behavioral ground truth,
    extras/unfused/models_delores.py:110, returns ``(pooled, taps)`` in the
    intended order; the shim re-binds forward with the unpack fixed and
    nothing else (SURVEY.md §2.5).

    lr is 0.003 (not configure_optimizers' 0.03 default): from this init,
    0.03 drives the combined loss through a chaotic spike (CE 16 -> 75 ->
    recovery) where any two fp implementations genuinely diverge — the
    torch twin blows up while the XLA one recovers. Equivalence is only
    well-posed in the stable regime; 0.003 descends monotonically."""
    import torch

    _install_reference(monkeypatch)
    import src.upstream.unfused.upstream_encoder as ref_enc_mod
    from src.upstream.unfused.upstream_expert import Upstream_Expert as UnfusedExpert

    def fixed_forward(self, x):
        x_1, x_2, x_3, x = self.encoder(x)
        (m, _) = torch.max(x, dim=1)
        x = m + torch.mean(x, dim=1)
        return x, (x_1, x_2, x_3)

    monkeypatch.setattr(ref_enc_mod.UNFUSED, "forward", fixed_forward)

    import jax
    import jax.numpy as jnp
    import optax

    from audiossl_tpu.config import load_config
    from audiossl_tpu.models.torch_export import audiontt_to_torch, projection_to_torch
    from audiossl_tpu.objectives.unfused import Unfused
    from audiossl_tpu.train.optim import sgd_torch

    config = load_config(None, "unfused")
    n_steps, batch, n_classes = 30, 32, int(config["pretrain"]["task_label"])
    config["pretrain"]["base_encoder"]["compute_dtype"] = "float32"
    config["pretrain"]["base_encoder"]["dropout"] = 0.0
    batches = _view_batches(6, batch)
    label_rng = np.random.default_rng(13)
    labels = [label_rng.integers(0, n_classes, batch).astype(np.int32) for _ in range(6)]

    # ---- our trainer --------------------------------------------------
    obj = Unfused(config, axis_name=None)
    dummy = jnp.zeros((batch, 64, 96, 1), jnp.float32)
    params, batch_stats, _ = obj.init(jax.random.key(0), (dummy, dummy))
    tx = sgd_torch(0.003, momentum=0.9, weight_decay=1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, v1, y):
        def loss_fn(p):
            return obj.loss(p, batch_stats, (), (v1, y), jax.random.key(1), True, None)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), aux.batch_stats, opt_state, loss, aux.metrics

    # ---- the reference trainer, from the SAME weights -------------------
    expert = UnfusedExpert(config, _load_reference_audiontt())
    to_t = lambda v: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))  # noqa: E731
    enc_sd = audiontt_to_torch(
        {"params": params["encoder"]["encoder"], "batch_stats": batch_stats["encoder"]["encoder"]}
    )
    expert.encoder_q.encoder.load_state_dict({k: to_t(v) for k, v in enc_sd.items()}, strict=True)
    for i in (1, 2, 3):
        sd = projection_to_torch(params[f"p{i}"], batch_stats[f"p{i}"])
        sd = {k: to_t(v) for k, v in sd.items() if not k.startswith("bn.")}  # Project has no norm tail
        getattr(expert, f"p{i}").load_state_dict(sd, strict=True)
    with torch.no_grad():
        expert.classifier.linear.weight.copy_(to_t(params["classifier"]["kernel"]).T)
        expert.classifier.linear.bias.copy_(to_t(params["classifier"]["bias"]))
    for m in expert.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    ref_logs = []
    expert.log_dict = lambda d, *a, **k: ref_logs.append({n: float(v) for n, v in d.items()})
    expert.train()
    opt = torch.optim.SGD(expert.parameters(), lr=0.003, momentum=0.9, weight_decay=1e-4)

    ours, ref, our_logs = [], [], []
    for i in range(n_steps):
        v1, _ = batches[i % len(batches)]
        y = labels[i % len(labels)]
        params, batch_stats, opt_state, loss, metrics = train_step(
            params, batch_stats, opt_state, jnp.asarray(v1)[..., None], jnp.asarray(y)
        )
        ours.append(float(loss))
        our_logs.append({n: float(v) for n, v in metrics.items()})

        tloss = expert.training_step(
            ((torch.from_numpy(v1[:, None]), None), torch.from_numpy(y.astype(np.int64))), i
        )
        opt.zero_grad()
        tloss.backward()
        opt.step()
        ref.append(float(tloss))

    ours, ref = np.asarray(ours), np.asarray(ref)
    rel = np.abs(ours - ref) / np.maximum(np.abs(ref), 1e-12)
    for i in (0, 1, 7, 15, 23, n_steps - 1):
        print(f"step {i:2d}: ours {ours[i]:.4f}  ref {ref[i]:.4f}  rel {rel[i]:.2e}")
    print(f"max rel dev over {n_steps} steps: {rel.max():.2e} at step {rel.argmax()}")
    assert rel[0] < 1e-4, (ours[0], ref[0])
    assert rel.max() < 2e-2, (rel.max(), rel.argmax())
    assert ref[-1] < ref[0] and ours[-1] < ours[0]  # supervised CE must descend

    # component losses (CE / KL / cosine-MSE) track individually
    for name in ("CE-loss", "kl-loss", "mse-loss"):
        o = np.asarray([log[name] for log in our_logs])
        r = np.asarray([log[name] for log in ref_logs])
        mrel = (np.abs(o - r) / np.maximum(np.abs(r), 1e-9)).max()
        print(f"{name}: max rel dev {mrel:.2e}")
        assert mrel < 5e-2, (name, mrel)


@pytest.mark.slow
def test_slicer_trainer_matches_reference(monkeypatch):
    """Same harness for SLICER (src/upstream/slicer/upstream_expert.py:183-237):
    MoCo InfoNCE + cluster-contrastive loss with TWO forwards per step — each
    momentum-updates the key tower and enqueues, so state advances twice per
    step. The reference's training_step computes the combined loss but
    backprops only the FIRST-direction CE (upstream_expert.py:237, a defect
    our objective deliberately fixes); this test mirrors the defect exactly —
    grads taken on `instance_loss_12` only, and the cluster head frozen the
    way torch SGD skips grad-less params — so the two trainers must track.

    Extra shim: `from src.utils import ClusterLoss` is a dangling import
    (SURVEY.md §2.5 — ClusterLoss lives only in
    extras/slicer/contrastive_loss.py); it is injected into src.utils before
    the expert imports."""
    import torch

    _install_reference(monkeypatch)
    import src.utils as ref_utils

    if not hasattr(ref_utils, "ClusterLoss"):
        spec = importlib.util.spec_from_file_location(
            "ref_contrastive_loss",
            os.path.join(REFERENCE, "extras", "slicer", "contrastive_loss.py"),
        )
        closs = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(closs)
        monkeypatch.setattr(ref_utils, "ClusterLoss", closs.ClusterLoss, raising=False)
    from src.upstream.slicer.upstream_expert import Upstream_Expert as SlicerExpert

    import jax
    import jax.numpy as jnp
    import optax

    from audiossl_tpu.config import load_config
    from audiossl_tpu.models.torch_export import audiontt_to_torch
    from audiossl_tpu.objectives.slicer import Slicer
    from audiossl_tpu.train.optim import sgd_torch

    config = load_config(None, "slicer")
    n_steps, batch, negatives = 22, 32, 512
    config["pretrain"]["num_negatives"] = negatives
    config["pretrain"]["base_encoder"]["compute_dtype"] = "float32"
    config["pretrain"]["base_encoder"]["dropout"] = 0.0
    batches = _view_batches(6, batch)

    # ---- our trainer, mirroring the reference's actual gradient -----------
    obj = Slicer(config, axis_name=None)
    dummy = jnp.zeros((batch, 64, 96, 1), jnp.float32)
    params, batch_stats, ssl = obj.init(jax.random.key(0), (dummy, dummy))
    tx = sgd_torch(0.03, momentum=0.9, weight_decay=1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, ssl, opt_state, v1, v2):
        def loss_fn(p):
            _, aux = obj.loss(p, batch_stats, ssl, (v1, v2), jax.random.key(1), True, None)
            return aux.metrics["instance_loss_12"], aux

        (ce, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # torch SGD skips grad-less params entirely (no update, no weight
        # decay): the cluster head only feeds the un-backpropped cluster
        # loss, so restore it verbatim
        new_params = {
            **new_params,
            "encoder": {
                **new_params["encoder"],
                "cluster_projector": params["encoder"]["cluster_projector"],
            },
        }
        return new_params, aux.batch_stats, aux.ssl_state, opt_state, ce, aux.metrics

    # ---- the reference trainer, from the SAME weights + queue -------------
    expert = SlicerExpert(config, _load_reference_audiontt(), emb_dim=128, num_negatives=negatives)
    to_t = lambda v: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))  # noqa: E731
    enc_sd = audiontt_to_torch(
        {"params": params["encoder"]["encoder"], "batch_stats": batch_stats["encoder"]["encoder"]}
    )
    expert.encoder_q.encoder.load_state_dict({k: to_t(v) for k, v in enc_sd.items()}, strict=True)
    with torch.no_grad():
        p_enc = params["encoder"]
        expert.encoder_q.instance_projector.weight.copy_(to_t(p_enc["instance_projector"]["kernel"]).T)
        expert.encoder_q.instance_projector.bias.copy_(to_t(p_enc["instance_projector"]["bias"]))
        for flax_name, torch_idx in (("Dense_0", "0"), ("Dense_1", "2")):
            lin = getattr(expert.encoder_q.cluster_projector, torch_idx)
            lin.weight.copy_(to_t(p_enc["cluster_projector"][flax_name]["kernel"]).T)
            lin.bias.copy_(to_t(p_enc["cluster_projector"][flax_name]["bias"]))
        expert.queue.copy_(to_t(ssl.queue))
        expert.queue_ptr.zero_()
    expert.encoder_k.load_state_dict(expert.encoder_q.state_dict(), strict=True)
    for m in expert.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    expert.trainer = SimpleNamespace(use_ddp=False, use_ddp2=False)
    ref_logs = []
    expert.log_dict = lambda d, *a, **k: ref_logs.append({n: float(v) for n, v in d.items()})
    expert.train()
    opt = torch.optim.SGD(expert.parameters(), lr=0.03, momentum=0.9, weight_decay=1e-4)

    ours, ref, our_logs = [], [], []
    for i in range(n_steps):
        v1, v2 = batches[i % len(batches)]
        params, batch_stats, ssl, opt_state, ce, metrics = train_step(
            params, batch_stats, ssl, opt_state,
            jnp.asarray(v1)[..., None], jnp.asarray(v2)[..., None],
        )
        ours.append(float(ce))
        our_logs.append({n: float(v) for n, v in metrics.items()})

        tloss = expert.training_step((torch.from_numpy(v1[:, None]), torch.from_numpy(v2[:, None])), i)
        opt.zero_grad()
        tloss.backward()
        opt.step()
        ref.append(float(tloss))

    ours, ref = np.asarray(ours), np.asarray(ref)
    rel = np.abs(ours - ref) / np.maximum(np.abs(ref), 1e-12)
    for i in (0, 1, 5, 11, 17, n_steps - 1):
        print(f"step {i:2d}: ours {ours[i]:.4f}  ref {ref[i]:.4f}  rel {rel[i]:.2e}")
    print(f"max rel dev over {n_steps} steps: {rel.max():.2e} at step {rel.argmax()}")
    assert rel[0] < 1e-4, (ours[0], ref[0])
    assert rel.max() < 2e-2, (rel.max(), rel.argmax())

    # the full logged metric set (combined, symmetric-instance, cluster)
    # tracks too — the cluster loss exercises the softmax head + the
    # column-contrastive path even though the reference never backprops it
    for name in ("train_loss", "sym_instance_loss", "train_loss_cluster"):
        o = np.asarray([log[name] for log in our_logs])
        r = np.asarray([log[name] for log in ref_logs])
        mrel = (np.abs(o - r) / np.maximum(np.abs(r), 1e-12)).max()
        print(f"{name}: max rel dev {mrel:.2e}")
        assert mrel < 2e-2, (name, mrel)

    # MoCo state parity: two enqueues per step -> ptr advanced 2*B*steps
    assert int(ssl.queue_ptr) == int(expert.queue_ptr) == (2 * n_steps * batch) % negatives
    q_ours, q_ref = np.asarray(ssl.queue), expert.queue.detach().numpy()
    assert np.abs(q_ours - q_ref).max() < 5e-3, np.abs(q_ours - q_ref).max()
    # momentum tower (updated twice per step) drifted identically
    k_sd_ours = audiontt_to_torch(
        {"params": ssl.params_k["encoder"], "batch_stats": ssl.batch_stats_k["encoder"]}
    )
    k_sd_ref = expert.encoder_k.encoder.state_dict()
    for name, v in k_sd_ours.items():
        if "num_batches_tracked" in name:
            continue
        d = np.abs(np.asarray(v) - k_sd_ref[name].numpy()).max()
        assert d < 5e-4, (name, d)
    d = np.abs(
        np.asarray(ssl.params_k["instance_projector"]["kernel"]).T
        - expert.encoder_k.instance_projector.weight.detach().numpy()
    ).max()
    assert d < 5e-4, ("instance_projector.weight (k tower)", d)


@pytest.mark.slow
def test_delores_m_trainer_matches_reference(monkeypatch):
    """Same harness for the MoCo trainer (the reference's hardest stateful
    one): src/upstream/delores_m/upstream_expert.py:222-278 — InfoNCE over
    [positive | 512-negative queue] + 3 tap Barlow projections, momentum key
    encoder updated inside forward, queue dequeue/enqueue + pointer advance
    every step. Both sides start from transplanted identical weights AND an
    identical initial queue; 24 steps of matched SGD must produce matching
    loss trajectories, queue contents, and pointers."""
    import torch

    _install_reference(monkeypatch)
    from src.upstream.delores_m.upstream_expert import Upstream_Expert as MocoExpert

    import jax
    import jax.numpy as jnp
    import optax

    from audiossl_tpu.models.torch_export import audiontt_to_torch, projection_to_torch
    from audiossl_tpu.objectives.delores_m import DeloresM
    from audiossl_tpu.train.optim import sgd_torch

    from audiossl_tpu.config import load_config

    config = load_config(None, "delores_m")
    n_steps, batch, negatives = 24, 32, 512
    config["pretrain"]["num_negatives"] = negatives
    config["pretrain"]["base_encoder"]["compute_dtype"] = "float32"
    config["pretrain"]["base_encoder"]["dropout"] = 0.0
    batches = _view_batches(6, batch)

    # ---- our trainer --------------------------------------------------
    obj = DeloresM(config, axis_name=None)
    dummy = jnp.zeros((batch, 64, 96, 1), jnp.float32)
    params, batch_stats, ssl = obj.init(jax.random.key(0), (dummy, dummy))
    tx = sgd_torch(0.03, momentum=0.9, weight_decay=1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, ssl, opt_state, v1, v2):
        def loss_fn(p):
            return obj.loss(p, batch_stats, ssl, (v1, v2), jax.random.key(1), True, None)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (
            optax.apply_updates(params, updates),
            aux.batch_stats, aux.ssl_state, opt_state, loss,
        )

    # ---- the reference trainer, from the SAME weights + queue ----------
    expert = MocoExpert(
        config, _load_reference_audiontt(),
        emb_dim=int(config["pretrain"]["contrastive_dim"]), num_negatives=negatives,
    )
    to_t = lambda v: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))  # noqa: E731
    enc_sd = audiontt_to_torch(
        {"params": params["encoder"]["encoder"], "batch_stats": batch_stats["encoder"]["encoder"]}
    )
    expert.encoder_q.encoder.load_state_dict({k: to_t(v) for k, v in enc_sd.items()}, strict=True)
    with torch.no_grad():
        expert.encoder_q.fc.weight.copy_(to_t(params["encoder"]["fc"]["kernel"]).T)
        expert.encoder_q.fc.bias.copy_(to_t(params["encoder"]["fc"]["bias"]))
        expert.queue.copy_(to_t(ssl.queue))
        expert.queue_ptr.zero_()
    expert.encoder_k.load_state_dict(expert.encoder_q.state_dict(), strict=True)
    for i in (1, 2, 3):
        sd = projection_to_torch(params[f"p{i}"], batch_stats[f"p{i}"])
        getattr(expert, f"p{i}").load_state_dict({k: to_t(v) for k, v in sd.items()}, strict=True)
    for m in expert.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    expert.trainer = SimpleNamespace(use_ddp=False, use_ddp2=False)
    expert.train()
    opt = torch.optim.SGD(
        (p for p in expert.parameters() if p.requires_grad),
        lr=0.03, momentum=0.9, weight_decay=1e-4,
    )

    ours, ref = [], []
    for i in range(n_steps):
        v1, v2 = batches[i % len(batches)]
        params, batch_stats, ssl, opt_state, loss = train_step(
            params, batch_stats, ssl, opt_state,
            jnp.asarray(v1)[..., None], jnp.asarray(v2)[..., None],
        )
        ours.append(float(loss))

        tloss = expert.training_step((torch.from_numpy(v1[:, None]), torch.from_numpy(v2[:, None])), i)
        opt.zero_grad()
        tloss.backward()
        opt.step()
        ref.append(float(tloss))

    ours, ref = np.asarray(ours), np.asarray(ref)
    rel = np.abs(ours - ref) / np.maximum(np.abs(ref), 1e-12)
    for i in (0, 1, 5, 11, 17, 23):
        print(f"step {i:2d}: ours {ours[i]:.4f}  ref {ref[i]:.4f}  rel {rel[i]:.2e}")
    print(f"max rel dev over {n_steps} steps: {rel.max():.2e} at step {rel.argmax()}")
    assert rel[0] < 1e-4, (ours[0], ref[0])
    assert rel.max() < 2e-2, (rel.max(), rel.argmax())

    # MoCo state parity after 24 steps: pointer position and queue contents
    # (24 steps x 32 keys wraps the 512 queue once; every column rewritten)
    assert int(ssl.queue_ptr) == int(expert.queue_ptr) == (n_steps * batch) % negatives
    q_ours, q_ref = np.asarray(ssl.queue), expert.queue.detach().numpy()
    assert np.abs(q_ours - q_ref).max() < 5e-3, np.abs(q_ours - q_ref).max()
    # momentum (key) encoder towers drifted identically: export our EMA copy
    # through the same bridge and compare every tensor by name
    k_sd_ours = audiontt_to_torch(
        {"params": ssl.params_k["encoder"], "batch_stats": ssl.batch_stats_k["encoder"]}
    )
    k_sd_ref = expert.encoder_k.encoder.state_dict()
    for name, v in k_sd_ours.items():
        if "num_batches_tracked" in name:
            continue
        d = np.abs(np.asarray(v) - k_sd_ref[name].numpy()).max()
        assert d < 5e-4, (name, d)


@pytest.mark.slow
def test_decar_trainer_matches_reference(monkeypatch):
    """Same harness for DECAR-v2 / DeepCluster-v2 (extras/decar-v2): the
    online spherical k-means over the embedding memory bank
    (utils.py:276-346 `cluster_memory` — rank-0-init centroids, all-reduced
    M-steps, centroids copied into the prototype weights, assignments
    all-gathered) plus the per-step prototype-CE train loop
    (main.py:216-250 — CE(ignore_index=-100), prototype-grad freeze window,
    memory refreshed in place with the detached view-1 embeddings).

    The ACTUAL reference functions run on the torch side: `cluster_memory`
    and `AudioNTT2020.forward` execute verbatim under single-process shims
    (`.cuda()` identity, world-size-1 torch.distributed no-ops, and
    torch.randperm pinned to the same permutation our kmeans_on_mesh draws,
    so both sides pick identical init centroids). The train-step glue
    (CE + freeze + memory write) is transcribed from main.py because
    main() itself needs argparse/SLURM/apex. Reference quirk honored by
    substitution: models_delores.py:97 hardcodes MultiPrototypes(out, [1024])
    regardless of args.nmb_prototypes — the clustering/training engine
    honors args, so the test rebuilds the prototype module at the test's K.

    Both optimizers are plain SGD with weight_decay=0: the reference freeze
    sets p.grad=None (torch then skips the param entirely, applying no wd),
    while ours zeroes the gradient — identical only at wd=0. The reference's
    LARC wrapper is apex (unavailable); our LARC has its own unit tests.

    Two full epochs: cluster -> 6 CE steps (freeze flips OFF mid-epoch at
    step 3) -> re-cluster on the refreshed memory -> 4 more steps."""
    import torch

    if "librosa" not in sys.modules:
        try:
            import librosa  # noqa: F401
        except ImportError:
            monkeypatch.setitem(sys.modules, "librosa", types.ModuleType("librosa"))

    base = os.path.join(REFERENCE, "extras", "decar-v2")
    spec = importlib.util.spec_from_file_location("decar_utils", os.path.join(base, "utils.py"))
    ref_utils = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_utils)
    monkeypatch.setitem(sys.modules, "utils", ref_utils)  # models_delores flat import
    spec = importlib.util.spec_from_file_location(
        "decar_models", os.path.join(base, "models_delores.py")
    )
    ref_models = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_models)

    # single-process shims for the reference's CUDA/DDP assumptions
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.distributed, "broadcast", lambda *a, **k: None, raising=False)
    monkeypatch.setattr(torch.distributed, "all_reduce", lambda *a, **k: None, raising=False)

    def fake_all_gather(tensor_list, tensor, async_op=False):
        tensor_list[0].copy_(tensor)
        return SimpleNamespace(wait=lambda: None)

    monkeypatch.setattr(torch.distributed, "all_gather", fake_all_gather, raising=False)

    import jax
    import jax.numpy as jnp
    import optax

    from audiossl_tpu.config import load_config
    from audiossl_tpu.models.torch_export import audiontt_to_torch
    from audiossl_tpu.objectives.decar import (
        DecarV2,
        decar_ce,
        kmeans_on_mesh,
        memory_update,
    )
    from audiossl_tpu.train.optim import sgd_torch

    config = load_config(None, "decar_v2")
    pre = config["pretrain"]
    batch, n_batches, k_protos, feat_dim = 16, 6, 16, 64
    n_total = batch * n_batches
    pre["nmb_prototypes"] = [k_protos]
    pre["feat_dim"] = feat_dim
    pre["freeze_prototypes_niters"] = 3
    pre["kmeans_iters"] = 10
    pre["base_encoder"]["compute_dtype"] = "float32"
    pre["base_encoder"]["dropout"] = 0.0
    batches = _view_batches(n_batches, batch)

    # ---- our trainer --------------------------------------------------
    obj = DecarV2(config, axis_name=None)
    dummy = jnp.zeros((batch, 64, 96, 1), jnp.float32)
    params, batch_stats, _ = obj.init(jax.random.key(0), (dummy, dummy))
    tx = sgd_torch(0.01, momentum=0.9, weight_decay=0.0)
    opt_state = tx.init(params)

    @jax.jit
    def embed_eval(params, batch_stats, v):
        emb, _ = obj.net.apply({"params": params, "batch_stats": batch_stats}, v, False)
        return emb

    @jax.jit
    def train_step(params, batch_stats, opt_state, v1, v2, targets, step_i):
        def loss_fn(p):
            (emb, _), mut = obj.apply_net(p, batch_stats, v1, jax.random.key(1), True)
            (_, scores2), mut2 = obj.net.apply(
                {"params": p, "batch_stats": mut["batch_stats"]},
                v2, True, rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"],
            )
            loss = decar_ce(scores2[0], targets, obj.temperature)
            return loss, (emb, mut2["batch_stats"])

        (loss, (emb, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = obj.freeze_prototype_grads(grads, step_i)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss, emb

    # ---- the reference model, from the SAME weights --------------------
    args = SimpleNamespace(
        rank=0, world_size=1, nmb_prototypes=[k_protos], crops_for_assign=[0],
        feat_dim=feat_dim, batch_size=batch, nmb_crops=[1],
    )
    ref_model = ref_models.AudioNTT2020(args, out_dim=feat_dim, n_mels=64, d=512)
    ref_model.prototypes = ref_utils.MultiPrototypes(feat_dim, [k_protos])
    to_t = lambda v: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))  # noqa: E731
    enc_sd = audiontt_to_torch(
        {"params": params["encoder"], "batch_stats": batch_stats["encoder"]}
    )
    remap = {  # src-layout block names -> decar-v2's flat features Sequential
        "features_1.0": "features.0", "features_1.1": "features.1",
        "features_2.0": "features.4", "features_2.1": "features.5",
        "features_3.0": "features.8", "features_3.1": "features.9",
    }
    sd = {}
    for k, v in enc_sd.items():
        for old, new in remap.items():
            if k.startswith(old + "."):
                k = new + k[len(old):]
                break
        sd[k] = to_t(v)
    sd["projection_head.0.weight"] = to_t(params["proj_fc1"]["kernel"]).T
    sd["projection_head.0.bias"] = to_t(params["proj_fc1"]["bias"])
    sd["projection_head.1.weight"] = to_t(params["proj_bn"]["scale"])
    sd["projection_head.1.bias"] = to_t(params["proj_bn"]["bias"])
    sd["projection_head.1.running_mean"] = to_t(batch_stats["proj_bn"]["mean"])
    sd["projection_head.1.running_var"] = to_t(batch_stats["proj_bn"]["var"])
    sd["projection_head.1.num_batches_tracked"] = torch.zeros((), dtype=torch.long)
    sd["projection_head.3.weight"] = to_t(params["proj_fc2"]["kernel"]).T
    sd["projection_head.3.bias"] = to_t(params["proj_fc2"]["bias"])
    sd["prototypes.prototypes0.weight"] = to_t(params["prototypes0"]["kernel"]).T
    ref_model.load_state_dict(sd, strict=True)
    for m in ref_model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    opt = torch.optim.SGD(ref_model.parameters(), lr=0.01, momentum=0.9, weight_decay=0.0)
    ce = torch.nn.CrossEntropyLoss(ignore_index=-100)

    # ---- memory bank init (eval-mode forward, utils.py:244-269) ---------
    mem_emb = np.zeros((n_total, feat_dim), np.float32)
    ref_model.eval()
    mem_t = torch.zeros(1, n_total, feat_dim)
    for i, (v1, v2) in enumerate(batches):
        emb = np.asarray(embed_eval(params, batch_stats, jnp.asarray(v1)[..., None]))
        mem_emb[i * batch : (i + 1) * batch] = emb
        with torch.no_grad():
            out = ref_model([torch.from_numpy(v1[:, None]), torch.from_numpy(v2[:, None])])
            mem_t[0, i * batch : (i + 1) * batch] = out[0]
    d0 = np.abs(mem_emb - mem_t[0].numpy()).max()
    print(f"memory-init transplant fidelity: {d0:.2e}")
    assert d0 < 1e-4, d0
    mem_idx = np.arange(n_total, dtype=np.int32)
    idx_t = torch.from_numpy(mem_idx.astype(np.int64))

    def cluster_both(params, mem_emb, mem_t, key):
        """Our kmeans_on_mesh vs the reference cluster_memory, same init."""
        cents, assigns = kmeans_on_mesh(
            jnp.asarray(mem_emb), jnp.asarray(mem_idx), n_total, k_protos, key,
            n_iters=10, axis_name=None,
        )
        new_params = obj.set_prototypes(params, [cents])

        full_perm = np.asarray(jax.random.permutation(key, n_total))

        def pinned_randperm(n, **kw):
            assert n == n_total
            return torch.from_numpy(full_perm.astype(np.int64))

        orig_randperm = torch.randperm
        torch.randperm = pinned_randperm  # scoped manually: monkeypatch.undo() would drop ALL shims
        try:
            assigns_t = ref_utils.cluster_memory(
                args, SimpleNamespace(module=ref_model), idx_t, mem_t, n_total,
                nmb_kmeans_iters=10,
            )
        finally:
            torch.randperm = orig_randperm
        return new_params, np.asarray(assigns), assigns_t[0].numpy()

    params, assign_j, assign_t = cluster_both(params, mem_emb, mem_t, jax.random.key(42))
    match = (assign_j == assign_t).mean()
    print(f"epoch-1 assignments match: {match:.4f}")
    assert match == 1.0, match
    c_ours = np.asarray(params["prototypes0"]["kernel"]).T
    c_ref = ref_model.prototypes.prototypes0.weight.detach().numpy()
    dc = np.abs(c_ours - c_ref).max()
    print(f"epoch-1 centroids max diff: {dc:.2e}")
    assert dc < 1e-3, dc

    # ---- train: 6 steps (freeze flips off at step 3), then re-cluster ----
    ref_model.train()
    ours_losses, ref_losses = [], []
    step_i = 0

    def one_epoch(params, batch_stats, opt_state, assign_j, assign_t, n_steps, step_i, mem_emb, mem_t):
        for i in range(n_steps):
            v1, v2 = batches[i % n_batches]
            idxs = np.arange(i * batch, (i + 1) * batch) % n_total
            targets = jnp.asarray(assign_j[idxs])
            params, batch_stats, opt_state, loss, emb = train_step(
                params, batch_stats, opt_state,
                jnp.asarray(v1)[..., None], jnp.asarray(v2)[..., None],
                targets, jnp.asarray(step_i),
            )
            ours_losses.append(float(loss))
            new_mem, _ = memory_update(
                jnp.asarray(mem_emb), jnp.asarray(mem_idx), emb, jnp.asarray(idxs.astype(np.int32)),
                jnp.asarray(i),
            )
            mem_emb = np.asarray(new_mem)

            t1, t2 = torch.from_numpy(v1[:, None]), torch.from_numpy(v2[:, None])
            emb_t, scores_t = ref_model([t1, t2])
            emb_t = emb_t.detach()
            loss_t = ce(scores_t[0] / 1.0, torch.from_numpy(assign_t[idxs]).long())
            opt.zero_grad()
            loss_t.backward()
            if step_i < pre["freeze_prototypes_niters"]:  # main.py:239-242
                for name, p in ref_model.named_parameters():
                    if "prototypes" in name:
                        p.grad = None
            opt.step()
            ref_losses.append(float(loss_t))
            with torch.no_grad():
                mem_t[0, i * batch : (i + 1) * batch] = emb_t
            step_i += 1
        return params, batch_stats, opt_state, step_i, mem_emb, mem_t

    params, batch_stats, opt_state, step_i, mem_emb, mem_t = one_epoch(
        params, batch_stats, opt_state, assign_j, assign_t, 6, step_i, mem_emb, mem_t
    )

    params, assign_j2, assign_t2 = cluster_both(params, mem_emb, mem_t, jax.random.key(43))
    match2 = (assign_j2 == assign_t2).mean()
    print(f"epoch-2 assignments match (post-training memory): {match2:.4f}")
    assert match2 == 1.0, match2

    params, batch_stats, opt_state, step_i, mem_emb, mem_t = one_epoch(
        params, batch_stats, opt_state, assign_j2, assign_t2, 4, step_i, mem_emb, mem_t
    )

    ours, ref = np.asarray(ours_losses), np.asarray(ref_losses)
    rel = np.abs(ours - ref) / np.maximum(np.abs(ref), 1e-12)
    for i in range(len(ours)):
        print(f"step {i:2d}: ours {ours[i]:.4f}  ref {ref[i]:.4f}  rel {rel[i]:.2e}")
    print(f"max rel dev over {len(ours)} steps: {rel.max():.2e} at step {rel.argmax()}")
    assert rel[0] < 1e-4, (ours[0], ref[0])
    assert rel.max() < 2e-2, (rel.max(), rel.argmax())

    # memory entries are live training embeddings — compare relative to
    # their scale (the late-step drift bounds them, same as the losses)
    scale = np.abs(mem_t[0].numpy()).max()
    diff = np.abs(mem_emb - mem_t[0].numpy())
    per_batch = [diff[b * batch : (b + 1) * batch].max() for b in range(n_batches)]
    print("per-slot-block max diffs:", ["%.1e" % v for v in per_batch])
    dm = diff.max() / scale
    print(f"final memory bank max rel diff: {dm:.2e} (scale {scale:.1f})")
    # per-coordinate embedding drift amplifies faster than the loss scalar
    # (measured 4e-2 at the last write after 10 matched steps); a structural
    # slot/ordering bug would show O(1)-relative rows, which 1e-1 catches
    assert dm < 1e-1, dm
    # the epoch-1 leftovers (slots never rewritten in epoch 2) were written
    # early, where drift was still ~1e-3 — hold them an order tighter
    assert max(per_batch[4:]) / scale < 1e-2, per_batch
    c_ours = np.asarray(params["prototypes0"]["kernel"]).T
    c_ref = ref_model.prototypes.prototypes0.weight.detach().numpy()
    dc = np.abs(c_ours - c_ref).max() / max(np.abs(c_ref).max(), 1e-12)
    print(f"final prototype weights max rel diff: {dc:.2e}")
    assert dc < 2e-2, dc
