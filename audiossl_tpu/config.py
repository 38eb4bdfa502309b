"""YAML config loading, preserving the reference schema (SURVEY.md §2.1).

`run.{num_dataloader_workers,batch_size,world_size,save_path,epochs}` +
`pretrain.{base_encoder{type,output_dim,return_all_layers}, projection_dim,
contrastive_dim, normalization, lambda_barlow, loss_scale,
input{type,sampling_rate,length_wave,n_mels}, augmentations{...}}`;
downstream configs add `run.{duration,freeze,epochs,lr}` and
`downstream.{finetune_layer, base_encoder.interim_layer_output_shapes}`.

Default config resolution mirrors train_upstream.py:21-27: per-method YAML
at configs/<upstream>.yaml unless -c overrides.
"""
from __future__ import annotations

import logging
import os
from typing import Any

import yaml

log = logging.getLogger("audiossl_tpu.config")

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")

# every run.* key any trainer reads (grep 'run.get(' / 'run[' over the
# package). The schema is otherwise deliberately loose — objectives read
# method-specific pretrain.* keys — but run.* is a closed vocabulary, so a
# typo there ("keep_checkpoint", "zero_optimiser") silently becoming a
# no-op default is pure footgun; warn on load instead.
RUN_KEYS = frozenset({
    "batch_size", "epochs", "learning_rate", "lr", "lr_schedule", "final_lr",
    "optimizer", "optimizer_args", "weight_decay", "layer_decay",
    "clip_grad_norm", "grad_accum_steps", "num_dataloader_workers",
    "save_path", "world_size", "duration", "freeze", "log_every",
    "wire_dtype", "data_on_error", "keep_checkpoints", "zero_optimizer",
    "fsdp", "compilation_cache_dir",
})


def load_config(path: str | None = None, upstream: str | None = None) -> dict[str, Any]:
    if path is None:
        if upstream is None:
            raise ValueError("need a config path or an --upstream name")
        path = os.path.join(CONFIG_DIR, f"{upstream}.yaml")
    with open(path) as f:
        cfg = yaml.safe_load(f)
    unknown = sorted(set((cfg or {}).get("run") or {}) - RUN_KEYS)
    if unknown:
        log.warning("unknown run.* config key(s) %s — no trainer reads them "
                    "(typo? known: %s)", unknown, sorted(RUN_KEYS))
    return cfg


def clip_samples(config: dict[str, Any], section: str = "pretrain") -> int:
    inp = config[section]["input"]
    return int(float(inp["length_wave"]) * int(inp["sampling_rate"]))
