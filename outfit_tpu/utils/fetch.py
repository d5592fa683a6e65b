"""Single-buffer device->host result fetch.

The relay/tunnel transport (and PCIe DMA generally) charges a per-transfer
setup cost on top of bandwidth: measured on the axon tunnel, each
``device_get`` round-trip costs ~5-25 ms regardless of size, with
~30 MB/s asymptotic bandwidth.  A fused fit's result set is ~30 small
arrays (~3.4 MB at 8192 trajectories), so fetching them individually pays
the setup cost 30x (~260 ms measured) while one packed buffer moves the
same bytes in ~100-135 ms — the stream pipeline's binding phase
(docs/DESIGN.md, "Optimization roadmap" item 6).

``pack_for_fetch`` flattens a pytree of device arrays into ONE f64 device
buffer (a tiny jitted concat dispatched AFTER the main kernels — it never
changes the main kernels' compiled executables), plus host metadata.
``unpack_fetched`` restores the exact original arrays: every production
dtype (f64, f32, int32, bool) round-trips through f64 bit-exactly —
f32/f64 are exact by widening, int32/bool values are exact integers far
below 2**53.

Parity note: the reference fetches nothing (results live in host memory,
e.g. obs_dataset_api.rs:145-207); this module exists because a TPU's
results must cross a link, and the link charges per message.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pack_for_fetch", "unpack_fetched"]


@jax.jit
def _pack_leaves(leaves):
    return jnp.concatenate([jnp.ravel(l).astype(jnp.float64) for l in leaves])


def pack_for_fetch(tree):
    """Return ``(packed_device_buffer, spec)`` for a pytree of device
    arrays, or ``(None, spec)`` when the tree holds no elements (the
    caller should then fall back to a direct ``device_get``)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    meta = [(tuple(l.shape), np.dtype(l.dtype)) for l in leaves]
    if not leaves or sum(int(np.prod(s)) for s, _ in meta) == 0:
        return None, (treedef, meta)
    return _pack_leaves(leaves), (treedef, meta)


def unpack_fetched(buf, spec):
    """Inverse of :func:`pack_for_fetch`: split the fetched host buffer
    back into the original pytree (exact shapes and dtypes)."""
    treedef, meta = spec
    buf = np.asarray(buf)
    out = []
    off = 0
    for shape, dtype in meta:
        n = int(np.prod(shape))
        a = buf[off : off + n].reshape(shape)
        out.append(a if a.dtype == dtype else a.astype(dtype))
        off += n
    return jax.tree_util.tree_unflatten(treedef, out)
