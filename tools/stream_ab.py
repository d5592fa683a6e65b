"""In-process A/B of the fit_lsq_stream finalize-pool width (1 vs 2 workers).

The axon tunnel's run-to-run variance is ~±40%, so only same-process
alternating measurements (ABAB...) are meaningful.  Workload mirrors
bench.py's pipelined headline (16384-trajectory synthetic datasets).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from outfit_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import outfit_tpu.lsq.api as lsq_api  # noqa: E402
from bench import synthetic_dataset  # noqa: E402
from outfit_tpu.ephem import JPLEphem  # noqa: E402
from outfit_tpu.iod.params import IODParams  # noqa: E402
from outfit_tpu.lsq import fit_lsq_stream  # noqa: E402
from outfit_tpu.lsq.config import DifferentialCorrectionConfig  # noqa: E402


def main(n_traj=16384, n_datasets=6, reps=3):
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    eph = JPLEphem.analytic(53500.0, 61500.0)
    params = IODParams(
        n_noise_realizations=3, precision="mixed", newton_max_it=20,
        max_triplets=2,
    )
    cfg = DifferentialCorrectionConfig(
        divergence_grace_iterations=2, precision="mixed",
        max_newton_iterations=4, prewarm_max_iterations=16,
    )
    ds0 = synthetic_dataset(n_traj, 12, eph, seed=99)
    t0 = time.time()
    next(fit_lsq_stream([ds0], eph, params, cfg, seed=7))
    print(f"warm/compile: {time.time()-t0:.1f}s", flush=True)

    datasets = [
        synthetic_dataset(n_traj, 12, eph, seed=400 + i)
        for i in range(n_datasets)
    ]

    def run(workers):
        lsq_api._FINALIZE_WORKERS = workers
        t0 = time.time()
        n_done = 0
        for _, res in fit_lsq_stream(iter(datasets), eph, params, cfg, seed=7):
            n_done += len(res)
        return n_done / (time.time() - t0)

    results = {1: [], 2: []}
    run(2)  # one throwaway to settle the tunnel
    for r in range(reps):
        for w in (1, 2):
            rate = run(w)
            results[w].append(rate)
            print(f"rep {r} workers={w}: {rate:.0f} fits/s", flush=True)
    for w in (1, 2):
        rs = sorted(results[w])
        print(f"workers={w}: median {rs[len(rs)//2]:.0f} best {rs[-1]:.0f} "
              f"all {[round(x) for x in rs]}", flush=True)


if __name__ == "__main__":
    main()
