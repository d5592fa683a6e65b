"""Stage-level wall profile of the REAL-CADENCE e2e workload (bench.py's
real_cadence_dataset: the repo's real MPC arcs 37/61/129 obs tiled to scale).

Splits host prep vs device execution per width bucket to attribute the
~600 us/traj cost (vs ~60 us/traj on the 12-obs synthetic workload).

Run:  python tools/real_cadence_profile.py [n_traj]
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

    def staged_run(ds, timings, chunk_detail=False):
        t0 = time.time()
        cache = ObserverCache.build(ds, eph)
        timings["cache"] = time.time() - t0

        mesh = resolve_mesh("auto")
        t0 = time.time()
        st = iod_api._fit_full_iod_dispatch(
            ds, eph, params, 7, None, None, cache, mesh
        )
        timings["iod_disp"] = time.time() - t0

        t0 = time.time()
        base = iod_api.device_base_arrays(ds, cache)
        runner = lsq_api._get_runner(cfg, eph, ds.bias_ra is not None, seeded=True)
        lsq_pend = []
        for (t0g, t1g, Tg, iod_out), (glob_dev, valid_dev) in zip(
            st["pending"], st["chunk_tables"]
        ):
            lsq_out, sig_dev, nact_dev, cov_tri_dev, _ok = runner(
                iod_out[0], iod_out[3], iod_out[4], base, glob_dev, valid_dev
            )
            lsq_pend.append((lsq_out.status, lsq_out.elements,
                             lsq_out.normalised_rms, cov_tri_dev,
                             lsq_out.total_newton_iterations,
                             nact_dev, sig_dev))
        timings["lsq_disp"] = time.time() - t0

        if chunk_detail:
            # per-chunk device wait (serially: chunk k's wait includes
            # earlier queued work, so print cumulative marks)
            print("  chunks:", [
                (int(Tg), int(t1g - t0g)) for (t0g, t1g, Tg, _o) in st["pending"]
            ])
            tprev = time.time()
            for i, (pend, lp) in enumerate(zip(st["pending"], lsq_pend)):
                jax.block_until_ready((pend[3], lp))
                tnow = time.time()
                print(f"  chunk{i} ready at +{tnow - tprev:.3f}s")

        t0 = time.time()
        jax.block_until_ready((st["pending"][-1][3], lsq_pend[-1]))
        timings["devwait"] = time.time() - t0
        t0 = time.time()
        iod_fetched, lsq_fetched = jax.device_get(
            ([o for *_, o in st["pending"]], lsq_pend)
        )
        timings["fetch"] = time.time() - t0

        t0 = time.time()
        iod_api._finalize_iod(st, iod_fetched)
        timings["build"] = time.time() - t0

    builder = lambda seed: bench.real_cadence_dataset(n_traj, seed=seed)

    ds = builder(100)
    t0 = time.time()
    timings = {}
    staged_run(ds, timings)
    print(f"compile+first: {time.time()-t0:.1f}s")

    for rep in range(3):
        ds = builder(101 + rep)
        timings = {}
        t0 = time.time()
        staged_run(ds, timings, chunk_detail=(rep == 2))
        total = time.time() - t0
        detail = " ".join(f"{k}={v*1e3:.0f}ms" for k, v in timings.items())
        print(f"rep{rep}: total={total*1e3:.0f}ms ({n_traj/total:.0f} fits/s) {detail}")


if __name__ == "__main__":
    main()
