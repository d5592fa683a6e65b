"""Mesh construction and batch-axis sharding helpers."""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    """1-D device mesh over the batch ('data') axis."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis,))


def pad_to_multiple(n: int, k: int) -> int:
    """Smallest multiple of k that is >= n."""
    return ((n + k - 1) // k) * k


def shard_batch(mesh: Mesh, x, axis: str = "data"):
    """Place an array (or pytree) with its leading axis sharded over the mesh.

    Leading dimensions must be divisible by the mesh size (pad lanes with
    :func:`pad_to_multiple` first; padded lanes carry masks downstream).
    """
    def _place(a):
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_place, x)
