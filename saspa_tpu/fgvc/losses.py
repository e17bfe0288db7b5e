"""Losses: cross-entropy, center loss, CLIP-distillation soft-target CE.

Specs: CenterLoss = sum((f - c)^2)/B (fgvc/util.py:15-21);
SoftTargetCrossEntropy_T with teacher temperature T=2 (fgvc/losses.py:66-88);
composite WS-DAN loss weights CE(raw)/3 + CE(aux) + CE(aug)*2/3 + center
(fgvc/train.py:496-500).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _acc(x):
    # f32 accumulation for low-precision inputs; never DOWNcast (f64 oracle
    # parity runs, tests/test_reference_oracle.py)
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over the batch; labels are int class ids."""
    logp = jax.nn.log_softmax(_acc(logits), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def cross_entropy_soft(logits: jax.Array, target_probs: jax.Array) -> jax.Array:
    """Mean CE against a soft label distribution (used by CutMix mixing)."""
    logp = jax.nn.log_softmax(_acc(logits), axis=-1)
    return jnp.mean(-jnp.sum(target_probs * logp, axis=-1))


def center_loss(features: jax.Array, centers: jax.Array) -> jax.Array:
    """MSE-sum to per-class feature centers / batch."""
    diff = _acc(features) - _acc(centers)
    return jnp.sum(diff * diff) / features.shape[0]


def soft_target_cross_entropy_T(student_logits: jax.Array, teacher_logits: jax.Array, T: float = 2.0) -> jax.Array:
    soft = jax.nn.softmax(_acc(teacher_logits) / T, axis=-1)
    logp = jax.nn.log_softmax(_acc(student_logits), axis=-1)
    return jnp.mean(jnp.sum(-soft * logp, axis=-1))


# NOTE: the composite WSDAN loss (CE/3 + CE(aux) + CE(aug)*2/3 + center,
# fgvc/train.py:496-500) lives inline in fgvc/train.py::make_train_step,
# where the CutMix soft-label and CLIP soft-target variants branch off it —
# a standalone copy here would silently drift from the real one.
