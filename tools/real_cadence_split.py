"""Split device time IOD vs LSQ for the real-cadence workload, and dump
iteration-count / convergence distributions per width bucket.

Run:  python tools/real_cadence_split.py [n_traj]
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

    from outfit_tpu.ephem import JPLEphem
    from outfit_tpu.iod import api as iod_api
    from outfit_tpu.iod.params import IODParams
    from outfit_tpu.lsq import api as lsq_api
    from outfit_tpu.lsq.config import DifferentialCorrectionConfig
    from outfit_tpu.observer.cache import ObserverCache
    from outfit_tpu.parallel import resolve_mesh

    eph = JPLEphem.analytic(53500.0, 61500.0)
    params = IODParams(
        n_noise_realizations=3, precision="mixed", newton_max_it=20,
        max_triplets=2,
    )
    cfg = DifferentialCorrectionConfig(
        divergence_grace_iterations=2, precision="mixed",
        max_newton_iterations=4, prewarm_max_iterations=16,
    )

    def staged_run(ds, label):
        cache = ObserverCache.build(ds, eph)
        mesh = resolve_mesh("auto")
        t0 = time.time()
        st = iod_api._fit_full_iod_dispatch(
            ds, eph, params, 7, None, None, cache, mesh
        )
        jax.block_until_ready([o for *_, o in st["pending"]])
        t_iod = time.time() - t0

        base = iod_api.device_base_arrays(ds, cache)
        runner = lsq_api._get_runner(cfg, eph, ds.bias_ra is not None, seeded=True)
        t0 = time.time()
        outs = []
        for (t0g, t1g, Tg, iod_out), (glob_dev, valid_dev) in zip(
            st["pending"], st["chunk_tables"]
        ):
            lsq_out, sig_dev, nact_dev, cov_tri_dev, _ok = runner(
                iod_out[0], iod_out[3], iod_out[4], base, glob_dev, valid_dev
            )
            outs.append((Tg, glob_dev.shape, lsq_out))
        jax.block_until_ready([o[2].status for o in outs])
        t_lsq = time.time() - t0
        print(f"{label}: IOD={t_iod*1e3:.0f}ms LSQ={t_lsq*1e3:.0f}ms")
        return outs

    builder = lambda seed: bench.real_cadence_dataset(n_traj, seed=seed)
    staged_run(builder(100), "compile")
    for rep in range(2):
        outs = staged_run(builder(101 + rep), f"rep{rep}")

    for Tg, shape, lsq_out in outs:
        status = np.asarray(lsq_out.status)[:Tg]
        nit = np.asarray(lsq_out.total_newton_iterations)[:Tg]
        conv = status == 1
        print(
            f"chunk rows={Tg} padded={shape}: conv={conv.mean()*100:.1f}% "
            f"newton_it conv med/p95={np.median(nit[conv]):.0f}/"
            f"{np.percentile(nit[conv], 95):.0f} "
            f"nonconv med={np.median(nit[~conv]) if (~conv).any() else 0:.0f} "
            f"status counts={np.bincount(status, minlength=5).tolist()}"
        )


if __name__ == "__main__":
    main()
