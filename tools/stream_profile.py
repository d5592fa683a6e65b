"""Same-process A/B: sequential fit_lsq vs pipelined fit_lsq_stream,
with per-phase timing of the stream (dispatch vs finalize).

python tools/stream_profile.py [n_traj] [n_datasets]
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    n_traj = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    n_ds = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    import bench

    bench._enable_compile_cache()

    from outfit_tpu.ephem import JPLEphem
    from outfit_tpu.iod.params import IODParams
    from outfit_tpu.lsq.api import fit_lsq, fit_lsq_dispatch, fit_lsq_finalize
    from outfit_tpu.lsq.config import DifferentialCorrectionConfig

    eph = JPLEphem.analytic(53500.0, 61500.0)
    params = IODParams(
        n_noise_realizations=3, precision="mixed", newton_max_it=20,
        max_triplets=2,
    )
    cfg = DifferentialCorrectionConfig(
        divergence_grace_iterations=2, precision="mixed",
        max_newton_iterations=4, prewarm_max_iterations=16,
    )

    datasets = [
        bench.synthetic_dataset(n_traj, 12, eph, seed=500 + i)
        for i in range(n_ds)
    ]
    # warm
    t0 = time.time()
    fit_lsq(datasets[0], eph, params, cfg, seed=7)
    print(f"warm/compile: {time.time()-t0:.1f}s")

    # sequential
    t0 = time.time()
    for ds in datasets:
        fit_lsq(ds, eph, params, cfg, seed=7)
    seq = time.time() - t0
    print(f"sequential: {seq:.2f}s ({n_ds*n_traj/seq:.0f} fits/s)")

    # fresh copies so memoized layout/base caches don't flatter the stream
    datasets2 = [
        bench.synthetic_dataset(n_traj, 12, eph, seed=600 + i)
        for i in range(n_ds)
    ]
    t0 = time.time()
    pend = []
    times = []
    for i, ds in enumerate(datasets2):
        td = time.time()
        pend.append(fit_lsq_dispatch(ds, eph, params, cfg, seed=7))
        times.append(("disp", i, time.time() - td))
        if len(pend) > 2:
            p = pend.pop(0)
            td = time.time()
            fit_lsq_finalize(p)
            times.append(("fin", i - 2, time.time() - td))
    while pend:
        p = pend.pop(0)
        td = time.time()
        fit_lsq_finalize(p)
        times.append(("fin", None, time.time() - td))
    strm = time.time() - t0
    print(f"stream:     {strm:.2f}s ({n_ds*n_traj/strm:.0f} fits/s)")
    print(" ".join(f"{k}{i}={v*1e3:.0f}" for k, i, v in times))


if __name__ == "__main__":
    main()
