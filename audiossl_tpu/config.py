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

import os
from typing import Any

import yaml

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def load_config(path: str | None = None, upstream: str | None = None) -> dict[str, Any]:
    if path is None:
        if upstream is None:
            raise ValueError("need a config path or an --upstream name")
        path = os.path.join(CONFIG_DIR, f"{upstream}.yaml")
    with open(path) as f:
        return yaml.safe_load(f)


def clip_samples(config: dict[str, Any], section: str = "pretrain") -> int:
    inp = config[section]["input"]
    return int(float(inp["length_wave"]) * int(inp["sampling_rate"]))
