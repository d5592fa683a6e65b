"""Stage decomposition of the IOD kernel by config sweep (warm timings)."""

import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    bench._enable_compile_cache()

    from outfit_tpu.iod.api import _iod_kernel
    from outfit_tpu.iod.params import IODParams
    from __graft_entry__ import _synthetic_batch

    n_traj = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    tri, obs_arrays, lane_traj, window = _synthetic_batch(
        n_traj=n_traj, lanes_per_traj=8, n_obs=12, seed=7
    )
    base = IODParams(n_noise_realizations=3, precision="mixed", newton_max_it=20)
    variants = [
        ("full (bench config)", base),
        ("newton_max_it=0 (no fg loop)", replace(base, newton_max_it=0)),
        ("newton_max_it=10", replace(base, newton_max_it=10)),
        ("aberth_max_iter=20", replace(base, aberth_max_iter=20)),
        ("polish_max_it=0", replace(base, polish_max_it=0)),
        ("pure f64", replace(base, precision="f64")),
    ]
    for name, p in variants:
        fn = jax.jit(lambda t, o, lt, w, pp=p: _iod_kernel(t, o, lt, w, pp))
        t0 = time.time()
        out = fn(tri, obs_arrays, lane_traj, window)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(tri, obs_arrays, lane_traj, window))
            best = min(best, time.perf_counter() - t0)
        rms = np.asarray(out[0])
        okr = np.isfinite(rms)
        print(
            f"{name:30s} {best*1e3:8.1f} ms   ok {okr.mean()*100:5.1f}%  "
            f"rms med {np.median(rms[okr]):.3e}   (compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
