"""In-process ABAB of fit_lsq_stream fetch depth: slim+table vs
slim+table+minimal_fetch (deferred IOD element vectors).  The stream is
fetch-bandwidth-bound on the relay link (docs/DESIGN.md calibration:
~41 MB/s device->host, strictly linear in bytes); minimal mode drops the
6-f64 equinoctial seed + 6-f32 display elements per row (~25% of the
remaining per-row bytes) and back-fills only non-converged rows via a tiny
second gather+fetch.  Workload mirrors bench.py's pipelined headline.
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
    for minimal in (False, True):
        next(fit_lsq_stream([ds0], eph, params, cfg, seed=7, slim_fetch=True,
                            as_table=True, minimal_fetch=minimal))
    print(f"warm/compile: {time.time()-t0:.1f}s", flush=True)

    datasets = [
        synthetic_dataset(n_traj, 12, eph, seed=400 + i)
        for i in range(n_datasets)
    ]

    def run(minimal):
        t0 = time.time()
        n_done = 0
        for _, res in fit_lsq_stream(
            iter(datasets), eph, params, cfg, seed=7, slim_fetch=True,
            as_table=True, minimal_fetch=minimal,
        ):
            n_done += len(res)
        return n_done / (time.time() - t0)

    results = {False: [], True: []}
    run(True)  # settle the tunnel
    for r in range(reps):
        for minimal in (False, True):
            fps = run(minimal)
            results[minimal].append(fps)
            print(
                f"rep {r} minimal={minimal}: {fps:.0f} fits/sec/chip",
                flush=True,
            )

    for minimal in (False, True):
        v = results[minimal]
        print(
            f"minimal={minimal}: best {max(v):.0f}"
            f"  median {sorted(v)[len(v)//2]:.0f}"
            f"  all {[f'{x:.0f}' for x in v]}",
            flush=True,
        )


if __name__ == "__main__":
    import sys

    kw = {}
    if len(sys.argv) > 1:
        kw["n_traj"] = int(sys.argv[1])
    if len(sys.argv) > 2:
        kw["n_datasets"] = int(sys.argv[2])
    main(**kw)
