"""In-process A/B: cond-gated cometary conversion vs the unconditional one.

Times the warm IOD kernel at the bench shape (8192 traj x 8 lanes x 12 obs,
mixed precision) with the shipped gated `_to_equinoctial` and with a
monkeypatched ungated variant, alternating in one process (tunnel variance
makes cross-process numbers incomparable).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from outfit_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import outfit_tpu.iod.api as iod_api  # noqa: E402
from outfit_tpu.elements.types import (  # noqa: E402
    CometaryElements,
    EquinoctialElements,
    KeplerianElements,
    cometary_to_equinoctial,
    keplerian_to_equinoctial,
)
from outfit_tpu.elements.orb_elem import KIND_KEPLERIAN  # noqa: E402
from outfit_tpu.iod.params import IODParams  # noqa: E402
from __graft_entry__ import _synthetic_batch  # noqa: E402


def _to_equinoctial_ungated(kind, el, epoch, relevant=None):
    kep = KeplerianElements(
        epoch, el[..., 0], el[..., 1], el[..., 2], el[..., 3], el[..., 4], el[..., 5]
    )
    eq_from_kep = keplerian_to_equinoctial(kep)
    com = CometaryElements(
        epoch, el[..., 0], el[..., 1], el[..., 2], el[..., 3], el[..., 4], el[..., 5]
    )
    eq_from_com = cometary_to_equinoctial(com)
    is_kep = kind == KIND_KEPLERIAN
    return EquinoctialElements(
        epoch,
        *[
            jnp.where(is_kep, a, jnp.where(jnp.isfinite(b), b, 0.0))
            for a, b in zip(eq_from_kep[1:], eq_from_com[1:])
        ],
    )


def main(reps=5):
    print(f"devices: {jax.devices()}", flush=True)
    params = IODParams(n_noise_realizations=3, precision="mixed", newton_max_it=20)
    tri, obs_arrays, lane_traj, window = _synthetic_batch(
        n_traj=8192, lanes_per_traj=8, n_obs=12, seed=7
    )

    gated_fn = jax.jit(
        lambda t, o, lt, w: iod_api._iod_kernel(t, o, lt, w, params)
    )
    orig = iod_api._to_equinoctial
    iod_api._to_equinoctial = _to_equinoctial_ungated
    ungated_fn = jax.jit(
        lambda t, o, lt, w: iod_api._iod_kernel(t, o, lt, w, params)
    )
    # trace both NOW so the monkeypatch state is captured per function
    t0 = time.time()
    out_u = ungated_fn(tri, obs_arrays, lane_traj, window)
    jax.block_until_ready(out_u)
    print(f"ungated compile+run: {time.time()-t0:.1f}s", flush=True)
    iod_api._to_equinoctial = orig
    t0 = time.time()
    out_g = gated_fn(tri, obs_arrays, lane_traj, window)
    jax.block_until_ready(out_g)
    print(f"gated   compile+run: {time.time()-t0:.1f}s", flush=True)

    import numpy as np

    # correctness: per-trajectory outputs identical for finite lanes
    rms_u, rms_g = np.asarray(out_u[0]), np.asarray(out_g[0])
    fin = np.isfinite(rms_u)
    assert (fin == np.isfinite(rms_g)).all()
    for i in (0, 2, 3, 4):
        a, b = np.asarray(out_u[i]), np.asarray(out_g[i])
        ok = np.allclose(a[fin], b[fin], rtol=1e-12, atol=1e-12, equal_nan=True)
        print(f"output[{i}] finite-lane agreement: {ok}", flush=True)

    res = {"gated": [], "ungated": []}
    for r in range(reps):
        for name, fn in (("gated", gated_fn), ("ungated", ungated_fn)):
            t0 = time.time()
            jax.block_until_ready(fn(tri, obs_arrays, lane_traj, window))
            dt = time.time() - t0
            res[name].append(dt)
            print(f"rep {r} {name}: {dt*1e3:.1f} ms", flush=True)
    for name, ts in res.items():
        ts = sorted(ts)
        print(
            f"{name}: min {ts[0]*1e3:.1f} ms median {ts[len(ts)//2]*1e3:.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
