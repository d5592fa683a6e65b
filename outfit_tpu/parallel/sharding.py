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


def auto_mesh(axis: str = "data") -> Optional[Mesh]:
    """1-D data mesh over all local devices; None on a single device.

    This is the user-API default: ``fit_full_iod``/``fit_lsq`` shard their
    batch axes over this mesh automatically (the reference ships
    ``fit_full_iod_parallel`` as a user entry point,
    obs_dataset_api.rs:174-207 — here parallel IS the entry point).
    """
    devices = jax.devices()
    if len(devices) < 2:
        return None
    return data_mesh(devices, axis)


def resolve_mesh(mesh):
    """Normalize a user ``mesh`` argument: "auto" -> auto_mesh(), None/False
    -> None (single-device), a Mesh passes through."""
    if isinstance(mesh, str):
        if mesh != "auto":
            raise ValueError(f"mesh must be 'auto', None, or a Mesh; got {mesh!r}")
        return auto_mesh()
    if mesh is None or mesh is False:
        return None
    return mesh


def replicate(mesh: Mesh, x):
    """Place an array (or pytree) fully replicated over the mesh."""

    def _place(a):
        return jax.device_put(a, NamedSharding(mesh, P(*([None] * a.ndim))))

    return jax.tree_util.tree_map(_place, x)


def shard_batch(mesh: Mesh, x, axis: str = "data"):
    """Place an array (or pytree) with its leading axis sharded over the mesh.

    Leading dimensions must be divisible by the mesh size (pad lanes with
    :func:`pad_to_multiple` first; padded lanes carry masks downstream).
    """
    def _place(a):
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_place, x)
