"""In-process A/B of the IOD lane configuration on the stream headline.

DESIGN's real-cadence sweep showed noise realizations are PURE COST once
triplets are diverse (K16 x r0 beat K8 x r5 at equal convergence).  The
12-obs synthetic stream headline still runs the round-1 lean config
(max_triplets=2 x 3 realizations = 8 lanes/traj).  This tool measures
whether fewer, noise-free lanes (K4 x r0 = 4 lanes, K8 x r0 = 8 lanes)
hold convergence at lower IOD device cost on the headline shape
(12 x 8192, minimal-fetch table mode).

Same-process alternating reps (tunnel variance ~±15%).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from outfit_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np  # noqa: E402

from bench import synthetic_dataset  # noqa: E402
from outfit_tpu.ephem import JPLEphem  # noqa: E402
from outfit_tpu.iod.params import IODParams  # noqa: E402
from outfit_tpu.lsq import fit_lsq_stream  # noqa: E402
from outfit_tpu.lsq.config import DifferentialCorrectionConfig  # noqa: E402


CONFIGS = {
    "K2xr3": dict(max_triplets=2, n_noise_realizations=3),   # current: 8 lanes
    "K4xr0": dict(max_triplets=4, n_noise_realizations=0),   # 4 lanes
    "K8xr0": dict(max_triplets=8, n_noise_realizations=0),   # 8 lanes
}


def main(n_traj=8192, n_datasets=6, reps=3):
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    eph = JPLEphem.analytic(53500.0, 61500.0)
    cfg = DifferentialCorrectionConfig(
        divergence_grace_iterations=2, precision="mixed",
        max_newton_iterations=4, prewarm_max_iterations=16,
    )
    params = {
        k: IODParams(precision="mixed", newton_max_it=20, **v)
        for k, v in CONFIGS.items()
    }

    ds0 = synthetic_dataset(n_traj, 12, eph, seed=99)
    for k, p in params.items():
        t0 = time.time()
        next(fit_lsq_stream(
            [ds0], eph, p, cfg, seed=7, slim_fetch=True, as_table=True,
            minimal_fetch=True,
        ))
        print(f"warm/compile {k}: {time.time()-t0:.1f}s", flush=True)

    datasets = [
        synthetic_dataset(n_traj, 12, eph, seed=400 + i)
        for i in range(n_datasets)
    ]

    def run(key):
        t0 = time.time()
        n_done = 0
        n_conv = 0
        for _, res in fit_lsq_stream(
            iter(datasets), eph, params[key], cfg, seed=7, slim_fetch=True,
            as_table=True, minimal_fetch=True,
        ):
            n_done += len(res)
            n_conv += int(np.asarray(res.converged).sum())
        return n_done / (time.time() - t0), n_conv / max(n_done, 1)

    results = {k: [] for k in CONFIGS}
    run("K2xr3")  # throwaway to settle the tunnel
    for r in range(reps):
        for k in CONFIGS:
            fps, conv = run(k)
            results[k].append((fps, conv))
            print(f"rep {r} {k}: {fps:.0f} fits/s, conv {conv*100:.2f}%",
                  flush=True)
    for k, v in results.items():
        fps = sorted(x[0] for x in v)
        conv = [x[1] for x in v]
        print(f"{k}: median {fps[len(fps)//2]:.0f} fits/s "
              f"(range {fps[0]:.0f}-{fps[-1]:.0f}), "
              f"conv {min(conv)*100:.2f}-{max(conv)*100:.2f}%", flush=True)


if __name__ == "__main__":
    main()
