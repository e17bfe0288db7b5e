"""Deterministic RNG streams.

The reference uses one global torch generator for every image
(run_aug/run_aug.py:324) plus python/numpy global seeding
(all_utils/utils.py:32-36).  Bitwise parity across frameworks is impossible,
so we define an explicit seed -> (purpose, image, prompt) mapping with
`jax.random.fold_in`: every work item gets an independent, reproducible key
regardless of sharding or batch order.  This is what makes the generation
stage resumable and mesh-order-invariant.
"""

from __future__ import annotations

import hashlib

import jax


# Stable, documented stream ids; never renumber.
STREAMS = {
    "noise": 0,  # diffusion initial latents
    "prompt_choice": 1,  # which prompt from the prompt pool
    "artistic": 2,  # artistic/camera suffix coin flips + choice
    "dropout": 3,  # model-internal randomness
    "attention_pick": 4,  # WSDAN attention-map sampling
    "augment": 5,  # train-time image augmentation
    "cutmix": 6,
    "aug_swap": 7,  # AugWrapper original/aug swap coin
    "subject_choice": 8,  # BLIP-diffusion same-class subject image pick
    "alia_amnesty": 9,  # 20% amnesty coin in ALIA filtering
}


def base_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def stream_key(seed: int, stream: str) -> jax.Array:
    return jax.random.fold_in(base_key(seed), STREAMS[stream])


def item_key(seed: int, stream: str, *indices: int) -> jax.Array:
    """Key for one work item, e.g. item_key(seed, 'noise', image_idx, prompt_idx)."""
    k = stream_key(seed, stream)
    for idx in indices:
        k = jax.random.fold_in(k, idx)
    return k


def string_fold(key: jax.Array, s: str) -> jax.Array:
    """Fold a string (e.g. an image path) into a key, stably across runs."""
    h = int.from_bytes(hashlib.sha256(s.encode()).digest()[:4], "little")
    return jax.random.fold_in(key, h)


def host_uniform(seed: int, stream: str, *indices: int) -> float:
    """A cheap host-side uniform in [0,1) derived from the same mapping, for
    host-side control flow (file skipping, sampling ratios) that must not
    depend on traced values."""
    h = hashlib.sha256(
        f"{seed}:{STREAMS[stream]}:{':'.join(map(str, indices))}".encode()
    ).digest()
    return int.from_bytes(h[:8], "little") / 2**64


def host_choice(n: int, seed: int, stream: str, *indices: int) -> int:
    """Host-side integer choice in [0, n)."""
    return int(host_uniform(seed, stream, *indices) * n) % max(n, 1)
