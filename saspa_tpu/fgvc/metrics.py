"""Metrics as pure-fn device accumulators.

The reference keeps stateful python metric objects fed per-batch host tensors
(fgvc/util.py:31-108).  Here the per-batch statistics (correct counts,
per-class counts) are computed on device inside the jitted step and
accumulated in tiny host-side containers, so no logits ever leave HBM.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def topk_correct(logits: jax.Array, labels: jax.Array, ks: Sequence[int] = (1, 5)) -> jax.Array:
    """Per-k correct counts for one batch -> (len(ks),) int32 array."""
    maxk = max(ks)
    k_eff = min(maxk, logits.shape[-1])
    _, pred = jax.lax.top_k(logits.astype(jnp.float32), k_eff)
    hit = pred == labels[:, None]  # (B, k_eff)
    cum = jnp.cumsum(hit, axis=-1)  # label appears at most once
    return jnp.stack([jnp.sum(cum[:, min(k, k_eff) - 1] > 0) for k in ks]).astype(jnp.int32)


def per_class_stats(logits: jax.Array, labels: jax.Array, num_classes: int) -> Tuple[jax.Array, jax.Array]:
    """(corrects, counts) per class for mean-class accuracy (fgvc/util.py:75-108)."""
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.int32)
    corrects = jnp.zeros(num_classes, jnp.int32).at[labels].add(correct)
    counts = jnp.zeros(num_classes, jnp.int32).at[labels].add(1)
    return corrects, counts


class AverageMeter:
    def __init__(self, name: str = "loss"):
        self.name = name
        self.reset()

    def reset(self):
        self.scores = 0.0
        self.total = 0.0

    def update(self, batch_score: float, n: int = 1) -> float:
        self.scores += float(batch_score)
        self.total += n
        return self.scores / max(self.total, 1)

    @property
    def value(self) -> float:
        return self.scores / max(self.total, 1)


class TopKAccuracy:
    name = "topk_accuracy"

    def __init__(self, ks: Sequence[int] = (1, 5)):
        self.ks = tuple(ks)
        self.reset()

    def reset(self):
        self.corrects = np.zeros(len(self.ks), np.int64)
        self.num_samples = 0

    def update(self, correct_counts, batch_size: int) -> np.ndarray:
        self.corrects += np.asarray(correct_counts, np.int64)
        self.num_samples += batch_size
        return self.value

    @property
    def value(self) -> np.ndarray:
        return self.corrects * 100.0 / max(self.num_samples, 1)


class MeanClassAccuracy:
    name = "mean_class_accuracy"

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.reset()

    def reset(self):
        self.corrects = np.zeros(self.num_classes, np.int64)
        self.counts = np.zeros(self.num_classes, np.int64)

    def update(self, corrects, counts) -> float:
        self.corrects += np.asarray(corrects, np.int64)
        self.counts += np.asarray(counts, np.int64)
        return self.value

    @property
    def value(self) -> float:
        acc = self.corrects / np.maximum(self.counts, 1)
        return float(np.nan_to_num(acc).mean() * 100.0)

    def accuracy_per_class(self) -> np.ndarray:
        """Per-class accuracy in [0,1], 0 for unseen classes (reference
        MeanClassAccuracyMetric.accuracy_per_class, fgvc/util.py:102-105)."""
        return np.nan_to_num(self.corrects / np.maximum(self.counts, 1))

    def total_accuracy(self) -> float:
        return float(self.corrects.sum() / max(self.counts.sum(), 1))
