"""Stage decomposition of the LSQ kernel by config sweep (warm timings).

Times run_differential_correction on the bench workload under config
variants to attribute the per-dispatch cost: prewarm, f64 Newton phase,
outlier passes, final linearization.  Each variant is its own compile —
run through the persistent cache, expect ~60 s per new variant via axon.
"""

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

    from outfit_tpu.iod.api import _iod_kernel
    from outfit_tpu.iod.params import IODParams
    from outfit_tpu.lsq.config import DifferentialCorrectionConfig
    from outfit_tpu.lsq.iteration import ObsArrays
    from outfit_tpu.lsq.loop import run_differential_correction
    from __graft_entry__ import _synthetic_batch

    n_traj = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    params = IODParams(n_noise_realizations=3, precision="mixed", newton_max_it=20)
    tri, obs_arrays, lane_traj, window = _synthetic_batch(
        n_traj=n_traj, lanes_per_traj=8, n_obs=12, seed=7
    )
    iod_fn = jax.jit(lambda t, o, lt, w: _iod_kernel(t, o, lt, w, params))
    out = jax.block_until_ready(iod_fn(tri, obs_arrays, lane_traj, window))

    best_rms, _k, _e, eqv, epoch, _c = out
    seed_eq = np.asarray(eqv)
    seed_ep = np.asarray(epoch)
    ok = (
        np.isfinite(np.asarray(best_rms))
        & np.isfinite(seed_eq).all(axis=1)
        & (np.abs(seed_eq[:, 0]) < 1e4)
    )
    seed_eq = np.where(ok[:, None], seed_eq, np.array([2.0, 0, 0, 0, 0, 1.0]))
    seed_ep = np.where(ok, seed_ep, 57000.0)

    mjd, ra, dec, sra, sdec, helio = obs_arrays
    T, N = mjd.shape
    obs = ObsArrays(
        mjd, ra, dec, sra, sdec,
        jnp.broadcast_to(jnp.asarray(helio), (T, N, 3)),
        jnp.ones((T, N), bool),
    )
    el = jnp.asarray(seed_eq)
    ep = jnp.asarray(seed_ep)

    base = dict(
        divergence_grace_iterations=2, precision="mixed",
        max_newton_iterations=4, prewarm_max_iterations=16,
    )
    variants = [
        ("full (bench config)", base),
        ("no prewarm", {**base, "prewarm_max_iterations": 0}),
        ("no outlier rejection", {**base, "enable_outlier_rejection": False}),
        ("1 f64 newton iter", {**base, "max_newton_iterations": 1}),
        ("pure f64", {**base, "precision": "f64", "max_newton_iterations": 12}),
    ]
    for name, kw in variants:
        cfg = DifferentialCorrectionConfig(**kw)
        fn = jax.jit(lambda e, t, o, c=cfg: run_differential_correction(e, t, o, c))
        t0 = time.time()
        res = jax.block_until_ready(fn(el, ep, obs))
        compile_s = time.time() - t0
        best = min(
            bench._timed(lambda: jax.block_until_ready(fn(el, ep, obs)))
            for _ in range(4)
        )
        conv = float((np.asarray(res.status) == 1).mean())
        print(
            f"{name:24s} {best*1e3:8.1f} ms   conv {conv*100:5.1f}%   "
            f"(compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
