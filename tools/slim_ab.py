"""In-process A/B of fit_lsq_stream slim_fetch (f32 covariance buffer).

The axon tunnel's run-to-run variance is ~±40%, so only same-process
alternating measurements (ABAB...) are meaningful.  Workload mirrors
bench.py's pipelined headline (16384-trajectory synthetic datasets).
The device->host link moves ~41 MB/s strictly linear in bytes
(docs/DESIGN.md relay calibration), and the stream is fetch-bound, so
halving the covariance/sigma payload should show up directly.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from outfit_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

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
    next(fit_lsq_stream([ds0], eph, params, cfg, seed=7, slim_fetch=True))
    print(f"warm/compile: {time.time()-t0:.1f}s", flush=True)

    datasets = [
        synthetic_dataset(n_traj, 12, eph, seed=400 + i)
        for i in range(n_datasets)
    ]

    def run(slim):
        t0 = time.time()
        n_done = 0
        for _, res in fit_lsq_stream(
            iter(datasets), eph, params, cfg, seed=7, slim_fetch=slim
        ):
            n_done += len(res)
        return n_done / (time.time() - t0)

    results = {False: [], True: []}
    run(True)  # one throwaway to settle the tunnel
    for r in range(reps):
        for slim in (False, True):
            fps = run(slim)
            results[slim].append(fps)
            print(f"rep {r} slim={slim}: {fps:.0f} fits/sec/chip", flush=True)

    for slim in (False, True):
        v = results[slim]
        print(
            f"slim={slim}: best {max(v):.0f}  median {sorted(v)[len(v)//2]:.0f}"
            f"  all {[f'{x:.0f}' for x in v]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
