"""Full-stack WAV -> linear-probe-accuracy parity vs the ACTUAL reference.

Closes the last inferential gap to BASELINE.md's north star (VERDICT r3
Next #1): the whole-trainer equivalence harnesses (test_reference_equiv.py)
inject identical pre-made view pairs, so the *composition* of the two
frameworks' input pipelines — librosa.load -> extract_window -> log-mel ->
AugmentationModule (reference `BaseDataset.__getitem__`,
src/dataset/upstream_dataset.py:50-88) vs our wavloader -> window ->
on-device frontend -> AugmentPipeline — had never been compared from the
same audio files to a downstream number. This test runs both frameworks'
COMPLETE pipelines end to end on one synthetic labeled WAV corpus:

  * the reference side builds the real `BaseDataset` + `AugmentationModule`
    + `Upstream_Expert` (delores_s) + torch SGD and pretrains from WAVs,
    with `librosa` shimmed (not installed here) to scipy-WAV loading + the
    float64 oracle STFT/mel of tests/oracles/librosa_oracle.py — the same
    oracle the frontend is parity-tested against at <=1e-3;
  * our side pretrains through `train_upstream` (the train_upstream.py CLI
    body) on the same manifest — int16 wire, jitted frontend + augs, the
    documented ring-buffer mixup deviation and all;
  * both encoders then embed the SAME held-out labeled windows through
    their own frontends, and one deterministic dual-ridge probe classifies
    each; accuracies must agree within a stated tolerance.

This is a distribution-level comparison (each side draws its own windows /
augmentations), which is exactly the level at which SURVEY.md §7 hard-part
(e) requires the mixup-bank deviation be validated.
"""
import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REFERENCE, "src")),
        reason="reference checkout not present",
    ),
]

SR = 16000
CLASS_HZ = [350.0, 800.0, 1700.0, 3000.0]
WAV_LEN = 17600  # 1.1 s: longer than the 0.95 s window -> random crops differ


def _write_corpus(d, n_per_class, seed):
    """Synthetic labeled sines (distinct fundamentals + noise) as 16-bit WAVs."""
    import scipy.io.wavfile as wavfile

    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    t = np.arange(WAV_LEN) / SR
    files, labels = [], []
    for c, hz in enumerate(CLASS_HZ):
        for i in range(n_per_class):
            f0 = hz * (1.0 + 0.05 * rng.standard_normal())
            amp = 0.4 + 0.2 * rng.random()
            w = amp * np.sin(2 * np.pi * f0 * t + rng.random() * 2 * np.pi)
            w += 0.5 * amp * np.sin(2 * np.pi * 2 * f0 * t)  # harmonic
            w += 0.05 * rng.standard_normal(WAV_LEN)
            path = os.path.join(d, f"c{c}_{i:03d}.wav")
            wavfile.write(path, SR, (np.clip(w, -1, 1) * 32767).astype(np.int16))
            files.append(path)
            labels.append(c)
    return files, np.asarray(labels)


def _install_librosa_shim(monkeypatch):
    """A FUNCTIONAL librosa stand-in: scipy WAV loading + the float64 oracle
    STFT / Slaney mel filterbank (librosa 0.8.1 numerics), covering exactly
    the surface `MelSpectrogramLibrosa` and `BaseDataset` touch."""
    import scipy.io.wavfile as wavfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from oracles.librosa_oracle import mel_fb_oracle, stft_oracle

    mod = types.ModuleType("librosa")
    core = types.ModuleType("librosa.core")
    filters = types.ModuleType("librosa.filters")

    def load(path, sr=SR):
        rate, data = wavfile.read(path)
        assert rate == sr, (rate, sr)  # corpus is written at the target rate
        wave = data.astype(np.float32) / 32768.0 if data.dtype == np.int16 else data.astype(np.float32)
        return wave, sr

    core.load = load
    mod.load = load
    filters.mel = lambda sr, n_fft, n_mels, fmin, fmax: mel_fb_oracle(
        sr, n_fft, n_mels, fmin, fmax
    )
    mod.stft = lambda y, n_fft=2048, hop_length=None: stft_oracle(y, n_fft, hop_length or n_fft // 4)
    mod.core = core
    mod.filters = filters
    for name, m in (("librosa", mod), ("librosa.core", core), ("librosa.filters", filters)):
        monkeypatch.setitem(sys.modules, name, m)
    # rebind modules that may have imported an earlier (empty) librosa shim
    for already in ("src.utils", "src.dataset.upstream_dataset"):
        if already in sys.modules:
            monkeypatch.setattr(sys.modules[already], "librosa", mod, raising=False)
    return mod


def _install_lightning(monkeypatch):
    import inspect

    import torch

    if "pytorch_lightning" in sys.modules:
        return
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

    class LightningDataModule:
        def __init__(self, *a, **k):
            pass

    pl.LightningModule = LightningModule
    pl.LightningDataModule = LightningDataModule
    monkeypatch.setitem(sys.modules, "pytorch_lightning", pl)


def _load_reference_audiontt():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_audiontt", os.path.join(REFERENCE, "src", "encoder", "audiontt.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.AudioNTT2020Task6


def _dual_ridge_probe(train_x, train_y, test_x, test_y, lam=1e-2):
    """Deterministic closed-form linear probe, identical for both sides.
    Embeddings are standardized per feature first so the two frameworks'
    (differently scaled) embedding spaces get the same treatment."""
    mu, sd = train_x.mean(0), train_x.std(0) + 1e-6
    train_x, test_x = (train_x - mu) / sd, (test_x - mu) / sd
    y = np.eye(int(train_y.max()) + 1)[train_y]
    k = train_x @ train_x.T
    alpha = np.linalg.solve(k + lam * np.eye(len(train_x)), y)
    pred = (test_x @ train_x.T) @ alpha
    return float((pred.argmax(1) == test_y).mean())


def test_wav_to_accuracy_parity(tmp_path, monkeypatch):
    import random

    import pandas as pd
    import torch

    _install_lightning(monkeypatch)
    _install_librosa_shim(monkeypatch)
    if REFERENCE not in sys.path:
        monkeypatch.syspath_prepend(REFERENCE)

    # ---- one corpus for both frameworks --------------------------------
    pre_files, _ = _write_corpus(str(tmp_path / "pretrain"), 16, seed=0)  # 64 wavs
    probe_files, probe_y = _write_corpus(str(tmp_path / "probe"), 16, seed=1)
    csv = str(tmp_path / "pretrain.csv")
    pd.DataFrame({"files": pre_files}).to_csv(csv, index=False)

    batch, epochs = 16, 6
    n_steps = epochs * (len(pre_files) // batch)  # 24

    # ---- OUR full pipeline: train_upstream (the CLI body) ---------------
    from audiossl_tpu.config import load_config
    from audiossl_tpu.train.loop import train_upstream

    cfg = load_config(None, "delores_s")
    cfg["run"].update(
        batch_size=batch, epochs=epochs, num_dataloader_workers=2,
        save_path=str(tmp_path / "ours"), log_every=1,
    )
    state, ckpt_dir = train_upstream(cfg, csv, "delores_s", max_steps=n_steps, save_every=0)
    assert int(state.step) == n_steps
    import json

    ours_losses = [
        json.loads(l)["train_loss"] for l in open(os.path.join(ckpt_dir, "stats.jsonl"))
    ]

    # ---- the REFERENCE full pipeline, from WAVs -------------------------
    from src.augmentations import AugmentationModule
    from src.dataset.upstream_dataset import BaseDataset
    from src.upstream.delores_s.upstream_expert import Upstream_Expert

    random.seed(0)
    # the reference augmentations draw from the GLOBAL numpy RNG
    # (src/augmentations/augmentations.py:34,99,102); seed it so the
    # reference side is deterministic regardless of which tests ran
    # earlier in this process (this flaked order-dependently in the full
    # slow-tier run before the seed)
    np.random.seed(0)
    torch.manual_seed(0)
    ref_cfg = load_config(None, "delores_s")
    ref_cfg["pretrain"]["lambda_barlow"] = float(ref_cfg["pretrain"]["lambda_barlow"])
    tfms = AugmentationModule(ref_cfg, len(pre_files))
    ds = BaseDataset(ref_cfg, SimpleNamespace(upstream="delores_s"), csv, tfms)
    loader = torch.utils.data.DataLoader(
        ds, shuffle=True, batch_size=batch, drop_last=True, num_workers=0
    )
    expert = Upstream_Expert(ref_cfg, _load_reference_audiontt())
    expert.trainer = SimpleNamespace(datamodule=SimpleNamespace(name="audio"))
    expert.train()
    opt = torch.optim.SGD(expert.parameters(), lr=0.03, momentum=0.9, weight_decay=1e-4)
    ref_losses = []
    step = 0
    for _ in range(epochs):
        for v1, v2 in loader:
            loss = expert.training_step((v1, v2), step)  # the real reference step
            opt.zero_grad()
            loss.backward()
            opt.step()
            ref_losses.append(float(loss.detach()))
            step += 1
    assert step == n_steps

    # both pipelines fed learnable signal: our loss descends strictly; the
    # reference's own loss starts at its floor on this tiny corpus (~0.45
    # from step 0, ±0.01 batch noise), so for it assert smoothed
    # non-divergence — the learnable-signal evidence for the reference
    # side is its ≥0.85 probe accuracy below
    assert ours_losses[-1] < ours_losses[0], (ours_losses[0], ours_losses[-1])
    ref_head, ref_tail = np.mean(ref_losses[:4]), np.mean(ref_losses[-4:])
    assert ref_tail < ref_head * 1.05, (ref_head, ref_tail)

    # ---- held-out probe: each encoder embeds through ITS OWN frontend ---
    import jax
    import jax.numpy as jnp

    from audiossl_tpu.frontend.stft import LogMelConfig, log_mel
    from audiossl_tpu.models.audiontt import AudioNTT2020Task6, max_mean_pool
    from src.utils import MelSpectrogramLibrosa, extract_log_mel_spectrogram

    clip = int(0.95 * SR)
    waves = np.stack(
        [np.asarray(sys.modules["librosa"].load(f, SR)[0][:clip]) for f in probe_files]
    ).astype(np.float32)

    enc = AudioNTT2020Task6(n_mels=64, d=int(cfg["pretrain"]["base_encoder"]["output_dim"]))
    mel_cfg = LogMelConfig()

    @jax.jit
    def embed_ours(w):
        lms = log_mel(w, mel_cfg)
        z = enc.apply(
            {
                "params": state.params["encoder"],
                "batch_stats": state.batch_stats["encoder"],
            },
            lms[..., None], False,
        )
        return max_mean_pool(z)

    emb_ours = np.asarray(embed_ours(jnp.asarray(waves)), np.float64)

    expert.eval()
    to_mel = MelSpectrogramLibrosa()
    with torch.no_grad():
        lms_t = torch.stack(
            [extract_log_mel_spectrogram(torch.tensor(w), to_mel) for w in waves]
        ).float()
        emb_ref = expert.encoder(lms_t[:, None]).numpy().astype(np.float64)

    n_train = 40  # 10 per class (corpus is class-ordered, so reshuffle)
    order = np.random.default_rng(5).permutation(len(probe_y))
    emb_ours, emb_ref, ys = emb_ours[order], emb_ref[order], probe_y[order]
    acc_ours = _dual_ridge_probe(emb_ours[:n_train], ys[:n_train], emb_ours[n_train:], ys[n_train:])
    acc_ref = _dual_ridge_probe(emb_ref[:n_train], ys[:n_train], emb_ref[n_train:], ys[n_train:])

    # numbers of record for PARITY.md (run with -s to see)
    print(
        f"\nfull-stack WAV->accuracy: ours {acc_ours:.4f}  reference {acc_ref:.4f}  "
        f"(loss ours {ours_losses[0]:.1f}->{ours_losses[-1]:.1f}, "
        f"ref {ref_losses[0]:.1f}->{ref_losses[-1]:.1f}, {n_steps} steps each)"
    )
    # stated tolerance: the probes see different augmentation/window draws,
    # so parity is distribution-level — both high, within 2 test items
    # (2/24 ≈ 0.084) of each other
    assert acc_ours >= 0.85, acc_ours
    assert acc_ref >= 0.85, acc_ref
    assert abs(acc_ours - acc_ref) <= 2 / 24 + 1e-9, (acc_ours, acc_ref)
