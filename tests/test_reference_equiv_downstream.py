"""Whole-trainer equivalence for the DOWNSTREAM path vs the reference.

The north-star parity target (BASELINE.md) is downstream task accuracy, so
the downstream trainer deserves the same trainer-level evidence as the six
upstream objectives: this runs the reference's ACTUAL DownstreamEncoder
(src/downstream/downstream_encoder.py, loaded standalone) under
train_downstream.py's loop semantics — CrossEntropyLoss + Adam over
requires_grad params (train_downstream.py:91-95,126-158), eval by argmax
accuracy (:164-184) — side-by-side with our DownstreamModel + the probe's
train step (downstream/probe.py:183-200) for 24 matched steps from
transplanted identical weights on identical deterministic log-mel batches,
in both the full fine-tune and the frozen-encoder regime (freeze_encoder,
src/utils/utils.py:223-227: requires_grad=False on the encoder, BN running
stats still updating — our optax.multi_transform head/frozen mask must
reproduce exactly that).

Both sides run f32 with dropout disabled (the only stochastic element;
`DownstreamModel.dropout_rate=0.0` here, torch Dropout.p=0 there — BN batch
stats stay live on both sides). finetune_layer is -1: the reference's tap
forward (`torch.mean(x[layer], dim=1)` on an already-pooled 2-D tap) is the
documented §2.5 feature-collapsing defect and not equivalence-testable.
"""
import importlib.util
import os

import numpy as np
import pytest

from tests.test_reference_equiv import (
    REFERENCE,
    _install_reference,
    _load_reference_audiontt,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "src")), reason="reference checkout not present"
)

N_CLASSES, BATCH, N_STEPS, LR = 4, 32, 24, 1e-3


def _load_reference_downstream():
    """src/downstream/downstream_encoder.py standalone (plain torch imports)."""
    spec = importlib.util.spec_from_file_location(
        "ref_downstream", os.path.join(REFERENCE, "src", "downstream", "downstream_encoder.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.DownstreamEncoder


def _class_batches(n_batches: int, batch: int, seed: int, n_mels: int = 64, frames: int = 96):
    """Deterministic separable data: class-dependent mel-band energy bumps
    on mean_var-normalized-looking log-mels, with labels."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_batches):
        y = rng.integers(0, N_CLASSES, size=batch)
        x = rng.standard_normal((batch, n_mels, frames)).astype(np.float32)
        for c in range(N_CLASSES):
            band = slice(c * (n_mels // N_CLASSES), (c + 1) * (n_mels // N_CLASSES))
            x[y == c, band, :] += 1.0
        out.append((x, y.astype(np.int64)))
    return out


@pytest.mark.slow
@pytest.mark.parametrize("freeze", [False, True], ids=["finetune", "frozen"])
def test_downstream_trainer_matches_reference(monkeypatch, freeze):
    import torch

    _install_reference(monkeypatch)
    RefEncoder = _load_reference_audiontt()
    RefDownstream = _load_reference_downstream()

    import jax
    import jax.numpy as jnp
    import optax

    from audiossl_tpu.downstream.model import DownstreamModel
    from audiossl_tpu.models.torch_export import audiontt_to_torch
    from audiossl_tpu.objectives.unfused import cross_entropy

    config = {
        "downstream": {
            "finetune_layer": -1,
            "base_encoder": {
                "type": "AudioNTT2020Task6",
                "output_dim": 2048,
                "return_all_layers": True,
                "interim_layer_output_shapes": [2048, 1024, 512],
            },
            "input": {"n_mels": 64},
        }
    }

    # ---- our downstream model + the probe's train-step semantics ----------
    model = DownstreamModel(
        n_mels=64, d=2048, num_classes=N_CLASSES,
        compute_dtype=jnp.float32, dropout_rate=0.0,
    )
    dummy = jnp.zeros((BATCH, 64, 96, 1), jnp.float32)
    variables = jax.jit(
        lambda k0, k1: model.init({"params": k0, "dropout": k1}, dummy, False)
    )(jax.random.key(0), jax.random.key(1))
    params, batch_stats = variables["params"], variables["batch_stats"]

    if freeze:
        # downstream/probe.py:172-178 — the product's frozen-encoder mask
        label_fn = lambda p: jax.tree.map_with_path(
            lambda path, _: "head" if path[0].key == "final" else "frozen", p
        )
        tx = optax.multi_transform(
            {"head": optax.adam(LR), "frozen": optax.set_to_zero()}, label_fn
        )
    else:
        tx = optax.adam(LR)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, True, mutable=["batch_stats"]
            )
            return cross_entropy(logits, y), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    # ---- the reference model, from the SAME weights ------------------------
    ref_model = RefDownstream(config, None, RefEncoder, no_of_classes=N_CLASSES)
    enc_sd = audiontt_to_torch(
        {"params": params["encoder"], "batch_stats": batch_stats["encoder"]}
    )
    ref_model.encoder.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in enc_sd.items()}, strict=True
    )
    with torch.no_grad():
        ref_model.final.weight.copy_(
            torch.from_numpy(np.ascontiguousarray(np.asarray(params["final"]["kernel"]).T))
        )
        ref_model.final.bias.copy_(torch.from_numpy(np.asarray(params["final"]["bias"])))
    for m in ref_model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    if freeze:
        # src/utils/utils.py:223-227 freeze_encoder + train_downstream.py:92-95
        for p in ref_model.encoder.parameters():
            p.requires_grad = False
    enc_sd0 = {k: v.clone() for k, v in ref_model.encoder.state_dict().items()}
    params_enc0 = jax.tree.map(np.asarray, params["encoder"])

    crit = torch.nn.CrossEntropyLoss()
    opt = torch.optim.Adam(filter(lambda p: p.requires_grad, ref_model.parameters()), lr=LR)

    # ---- matched training ---------------------------------------------------
    batches = _class_batches(6, BATCH, seed=5)
    ref_model.train()
    ours, ref = [], []
    for i in range(N_STEPS):
        x, y = batches[i % len(batches)]
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, jnp.asarray(x)[..., None], jnp.asarray(y)
        )
        ours.append(float(loss))

        out = ref_model(torch.from_numpy(x[:, None]))
        tloss = crit(out, torch.from_numpy(y))
        opt.zero_grad()
        tloss.backward()
        opt.step()
        ref.append(float(tloss))

    ours, ref = np.asarray(ours), np.asarray(ref)
    # rtol for the descending regime + atol for the tail: once CE saturates
    # toward the f32 zero floor, per-step "relative" deviation between two
    # ~1e-5 losses is meaningless
    dev = np.abs(ours - ref) / (np.abs(ref) * 2e-2 + 1e-4)
    rel = np.abs(ours - ref) / np.maximum(np.abs(ref), 1e-12)
    for i in (0, 1, 5, 11, 17, 23):
        print(f"step {i:2d}: ours {ours[i]:.4f}  ref {ref[i]:.4f}  rel {rel[i]:.2e}")
    print(f"[{'frozen' if freeze else 'finetune'}] max rel dev: {rel.max():.2e} at step {rel.argmax()}")
    assert rel[0] < 1e-4, (ours[0], ref[0])
    assert dev.max() < 1.0, (dev.max(), dev.argmax(), ours[dev.argmax()], ref[dev.argmax()])
    assert ours[-1] < ours[0] and ref[-1] < ref[0]  # both actually trained

    if freeze:
        # encoder weights must be bitwise untouched on BOTH sides...
        for k, v in ref_model.encoder.state_dict().items():
            if "running" in k or "num_batches" in k:
                continue  # BN statistics DO update in train mode
            assert torch.equal(v, enc_sd0[k]), f"reference {k} moved under freeze"
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            params["encoder"], params_enc0,
        )
        # ...while the BN running stats drift — identically on both sides
        enc_sd_now = audiontt_to_torch(
            {"params": params["encoder"], "batch_stats": batch_stats["encoder"]}
        )
        rm = "features_1.1.running_mean"
        assert not torch.equal(ref_model.encoder.state_dict()[rm], enc_sd0[rm])
        np.testing.assert_allclose(
            enc_sd_now[rm], ref_model.encoder.state_dict()[rm].numpy(), rtol=0, atol=1e-4
        )

    # ---- eval parity (train_downstream.py:164-184 argmax accuracy) ---------
    test_batches = _class_batches(2, BATCH, seed=13)
    ref_model.eval()
    accs_ours, accs_ref = [], []
    eval_fn = jax.jit(
        lambda p, bs, x: jnp.argmax(
            model.apply({"params": p, "batch_stats": bs}, x, False), axis=1
        )
    )
    for x, y in test_batches:
        pred_j = np.asarray(eval_fn(params, batch_stats, jnp.asarray(x)[..., None]))
        with torch.no_grad():
            pred_t = torch.argmax(ref_model(torch.from_numpy(x[:, None])), dim=1).numpy()
        accs_ours.append((pred_j == y).mean())
        accs_ref.append((pred_t == y).mean())
    acc_ours, acc_ref = float(np.mean(accs_ours)), float(np.mean(accs_ref))
    print(f"[{'frozen' if freeze else 'finetune'}] test acc ours={acc_ours:.3f} ref={acc_ref:.3f}")
    assert acc_ours == acc_ref, (acc_ours, acc_ref)
    if not freeze:
        assert acc_ours > 0.9, acc_ours  # the task is separable
