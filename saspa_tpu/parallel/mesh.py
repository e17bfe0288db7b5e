"""Device mesh + sharding helpers.

The reference has no distributed backend at all (hardcoded cuda:0,
all_utils/utils.py:29; scale-out = manual per-GPU launches + aug-JSON merges,
all_utils/utils.py:485-511).  Here parallelism is first-class: one
`jax.sharding.Mesh` whose `data` axis carries both the generation worklist
fan-out and data-parallel classifier training over ICI, and an optional
`model` axis for tensor-sharding the diffusion UNet if it ever outgrows a
chip.  Collectives (gradient psum, feature-center all-reduce) come from pjit
partitioning — nothing is hand-written NCCL-style.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
    devices=None,
) -> Mesh:
    """Build a mesh. Default: all devices on the data axis, model axis of 1.

    `shape` lets callers request e.g. (4, 2) for dp=4 x tp=2. The product must
    equal the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names[: len(shape)]))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) dim over the data axis, replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of arrays with batch-dim sharding.

    jax.Array leaves (e.g. batches already produced on-device by the jitted
    train transforms) are resharded directly — np.asarray on them would force
    a blocking device→host copy plus a re-upload every step."""
    def _put(x):
        arr = x if isinstance(x, jax.Array) else np.asarray(x)
        return jax.device_put(arr, data_sharding(mesh, arr.ndim))

    return jax.tree_util.tree_map(_put, batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
