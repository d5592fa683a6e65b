"""Attribute the real-cadence IOD device time by stubbing stages.

Variants (IOD dispatch devwait only):
  full        production params
  no-fg       newton_max_it=0 (skips the f-g correction while loop)
  no-polish   polish_max_it=0
  stub-score  rms_orbit_error replaced by a propagation-free stand-in
  aberth-1    aberth_max_iter=1

Run:  python tools/real_cadence_iod_chop.py [n_traj]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n_traj = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

    import bench

    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from outfit_tpu.ephem import JPLEphem
    from outfit_tpu.iod import api as iod_api
    from outfit_tpu.iod.params import IODParams
    from outfit_tpu.observer.cache import ObserverCache
    from outfit_tpu.parallel import resolve_mesh

    eph = JPLEphem.analytic(53500.0, 61500.0)

    def make_params(**kw):
        d = dict(
            n_noise_realizations=3, precision="mixed", newton_max_it=20,
            max_triplets=2,
        )
        d.update(kw)
        return IODParams(**d)

    real_score = iod_api.rms_orbit_error

    def stub_score(eq, mjd, ra, dec, sra, sdec, helio, wmask):
        return jnp.where(jnp.any(wmask, -1), jnp.abs(eq.h) + 1.0, jnp.inf)

    ds_warm = bench.real_cadence_dataset(n_traj, seed=100)
    ds_run = bench.real_cadence_dataset(n_traj, seed=101)
    mesh = resolve_mesh("auto")

    def run(name, params, score=None):
        iod_api.rms_orbit_error = score or real_score
        # re-wrap the jits so a patched scoring function cannot hit a stale
        # compiled executable
        iod_api._iod_kernel_dense_jit = jax.jit(
            iod_api._iod_kernel_dense, static_argnames=("params", "m_cap")
        )
        iod_api._iod_kernel_gather_jit = jax.jit(
            iod_api._iod_kernel_gather, static_argnames=("params",)
        )
        best = float("inf")
        for i, ds in enumerate((ds_warm, ds_run, ds_run, ds_run, ds_run)):
            cache = ObserverCache.build(ds, eph)
            t0 = time.time()
            st = iod_api._fit_full_iod_dispatch(
                ds, eph, params, 7, None, None, cache, mesh
            )
            jax.block_until_ready([o for *_, o in st["pending"]])
            dt = time.time() - t0
            if i:
                best = min(best, dt)
        print(f"{name:12s} {best*1e3:7.0f} ms")
        iod_api.rms_orbit_error = real_score

    run("full", make_params())
    run("no-fg", make_params(newton_max_it=0))
    run("no-polish", make_params(polish_max_it=0))
    run("aberth-1", make_params(aberth_max_iter=1))
    run("stub-score", make_params(), score=stub_score)
    run("no-fg+stub", make_params(newton_max_it=0), score=stub_score)


if __name__ == "__main__":
    main()
