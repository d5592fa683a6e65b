"""Finer IOD chop: stub out scoring / root finding to attribute the base cost."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    bench._enable_compile_cache()

    import outfit_tpu.iod.api as api
    import outfit_tpu.iod.gauss as gauss
    from outfit_tpu.iod.params import IODParams
    from __graft_entry__ import _synthetic_batch

    n_traj = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    tri, obs_arrays, lane_traj, window = _synthetic_batch(
        n_traj=n_traj, lanes_per_traj=8, n_obs=12, seed=7
    )
    base = IODParams(n_noise_realizations=3, precision="mixed", newton_max_it=0)

    real_score = api.rms_orbit_error

    def stub_score(eq, mjd, ra, dec, sra, sdec, helio, wmask):
        # structurally comparable output, no two-body propagation
        return jnp.where(
            jnp.any(wmask, -1), jnp.abs(eq.h) + 1.0, jnp.inf
        )

    def run(name):
        fn = jax.jit(lambda t, o, lt, w: api._iod_kernel(t, o, lt, w, base))
        t0 = time.time()
        out = fn(tri, obs_arrays, lane_traj, window)
        jax.block_until_ready(out)
        c = time.time() - t0
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(tri, obs_arrays, lane_traj, window))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:34s} {best*1e3:8.1f} ms  (compile {c:.0f}s)", flush=True)

    run("newton0 full")

    # cumulative stubbing from here on
    api.rms_orbit_error = stub_score
    run("+ scoring stubbed")

    class _R:
        def __init__(self, re, im):
            self.real, self.imag = re, im

    def stub_aberth(c0, c3, c6, max_iter, eps):
        re = jnp.stack([jnp.full(jnp.shape(c0), 1.5 + 0.1 * i) for i in range(8)], -1)
        return _R(re.astype(c0.dtype), jnp.zeros_like(re, c0.dtype))

    gauss.aberth_deg8 = stub_aberth
    run("+ aberth stubbed")

    real_ccek1 = api.ccek1
    from collections import namedtuple

    _CK = namedtuple("_CK", ["kind", "elements"])

    def stub_ccek1(p, v):
        el = jnp.stack(
            [jnp.linalg.norm(p, axis=-1), jnp.abs(v[..., 0]),
             v[..., 1], v[..., 2], p[..., 0], p[..., 1]], axis=-1
        )
        return _CK(jnp.zeros(p.shape[:-1], jnp.int32), el)

    api.ccek1 = stub_ccek1
    gauss.ccek1 = stub_ccek1
    run("+ ccek1 stubbed (both precisions)")

    real_toeq = api._to_equinoctial

    def stub_toeq(kind, el, epoch):
        from outfit_tpu.elements.types import EquinoctialElements

        z = jnp.zeros_like(el[..., 0])
        return EquinoctialElements(epoch, el[..., 0], 0.1 + z, 0.1 + z, z, z, 1.0 + z)

    api._to_equinoctial = stub_toeq
    run("+ to_equinoctial stubbed")

    real_polish = api.polish_selected

    def stub_polish(tri_t, r2, pos, vel, epoch, corrected, chi1, chi2, params, mx):
        return (jnp.asarray(pos, jnp.float64), jnp.asarray(vel, jnp.float64),
                jnp.asarray(epoch, jnp.float64), corrected)

    api.polish_selected = stub_polish
    run("+ polish stubbed")

    real_ecc = gauss.eccentricity_control

    def stub_ecc(p, v, peri, emax):
        r = jnp.linalg.norm(p, axis=-1)
        return r > 0.1, 0.1 * r, r, -0.5 / jnp.maximum(r, 0.1)

    gauss.eccentricity_control = stub_ecc
    run("+ eccentricity_control stubbed")


if __name__ == "__main__":
    main()
