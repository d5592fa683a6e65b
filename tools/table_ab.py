"""In-process ABAB of fit_lsq_stream result modes: dict vs columnar table
(as_table=True), both under slim_fetch.  The finalize's per-row object
construction is GIL-bound Python (~5-15 us/traj) that contends with the
dispatch thread; the table skips it entirely.  Workload mirrors bench.py's
pipelined headline.
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
    next(fit_lsq_stream([ds0], eph, params, cfg, seed=7, slim_fetch=True))
    next(fit_lsq_stream([ds0], eph, params, cfg, seed=7, slim_fetch=True,
                        as_table=True))
    print(f"warm/compile: {time.time()-t0:.1f}s", flush=True)

    datasets = [
        synthetic_dataset(n_traj, 12, eph, seed=400 + i)
        for i in range(n_datasets)
    ]

    def run(table):
        t0 = time.time()
        n_done = 0
        for _, res in fit_lsq_stream(
            iter(datasets), eph, params, cfg, seed=7, slim_fetch=True,
            as_table=table,
        ):
            n_done += len(res)
        return n_done / (time.time() - t0)

    results = {False: [], True: []}
    run(True)  # settle the tunnel
    for r in range(reps):
        for table in (False, True):
            fps = run(table)
            results[table].append(fps)
            print(f"rep {r} table={table}: {fps:.0f} fits/sec/chip", flush=True)

    for table in (False, True):
        v = results[table]
        print(
            f"table={table}: best {max(v):.0f}  median {sorted(v)[len(v)//2]:.0f}"
            f"  all {[f'{x:.0f}' for x in v]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
