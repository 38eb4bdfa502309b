"""DINO-style centering loss (reference: extras/decar-v2/dino_loss.py:7-65).

The reference keeps this as an unused variant next to DECAR; provided here
for completeness with the same semantics: teacher outputs centered by an
EMA center (psum across the mesh ≙ the all_reduce at dino_loss.py:61),
sharpened by a warmup-scheduled temperature, student CE against them.

Note the reference's forward ultimately returns the *simplified* uncommented
path (sum(teacher * log_softmax(student))); both forms are provided.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DinoState(NamedTuple):
    center: jax.Array  # [1, out_dim]


def dino_init(out_dim: int) -> DinoState:
    return DinoState(center=jnp.zeros((1, out_dim), jnp.float32))


def teacher_temp_schedule(
    warmup_teacher_temp: float, teacher_temp: float, warmup_epochs: int, nepochs: int
) -> np.ndarray:
    return np.concatenate(
        [np.linspace(warmup_teacher_temp, teacher_temp, warmup_epochs),
         np.full(max(nepochs - warmup_epochs, 0), teacher_temp)]
    )


def dino_loss(
    student_out: jax.Array,
    teacher_out: jax.Array,
    state: DinoState,
    teacher_temp: float,
    student_temp: float = 0.1,
    center_momentum: float = 0.9,
    axis_name: str | None = None,
    simplified: bool = True,
) -> tuple[jax.Array, DinoState]:
    """-> (loss, new_state). ``simplified=True`` matches the code path the
    reference actually returns (dino_loss.py:49-53) exactly: RAW student
    logits (the temperature-divided tensor is chunked but never used there),
    raw teacher outputs, positive sign, and no centering. The reference's
    live forward also never calls update_center (dino_loss.py:47 is
    commented out), so its buffer stays zero; we advance the center state
    anyway so the full variant is usable — with ``simplified=True`` the
    center does not enter the loss, so this is a strict superset.
    ``simplified=False`` is the commented-out published-DINO form for one
    (student, teacher) view pair (dino_loss.py:37-46 + 55-65)."""
    teacher_out = jax.lax.stop_gradient(teacher_out)
    if simplified:
        loss = jnp.mean(jnp.sum(teacher_out * jax.nn.log_softmax(student_out, -1), -1))
    else:
        t = jax.nn.softmax((teacher_out - state.center) / teacher_temp, axis=-1)
        loss = jnp.mean(jnp.sum(-t * jax.nn.log_softmax(student_out / student_temp, -1), -1))

    batch_center = jnp.sum(teacher_out, axis=0, keepdims=True)
    denom = teacher_out.shape[0]
    if axis_name is not None:
        batch_center = jax.lax.psum(batch_center, axis_name)
        denom = denom * jax.lax.axis_size(axis_name)
    batch_center = batch_center / denom
    new_center = state.center * center_momentum + batch_center * (1.0 - center_momentum)
    return loss, DinoState(center=new_center)
