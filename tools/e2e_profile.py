"""Stage-level wall profile of the fused fit_lsq end-to-end path.

Mirrors bench.py's bench_e2e workload (8192 traj x 12 obs by default) but
times each stage of the fused pipeline separately:

  cache     ObserverCache.build (host + device frame-table work)
  iod_disp  _fit_full_iod_dispatch (ALL host prep + async IOD dispatch)
  lsq_disp  seeded correction dispatches (async)
  fetch     ONE bulk device_get for both stages
  build     python result-dict construction

Run:  python tools/e2e_profile.py [n_traj]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n_traj = int(sys.argv[1]) if len(sys.argv) > 1 else 8192

    import bench

    bench._enable_compile_cache()
    import jax

    from outfit_tpu.ephem import JPLEphem
    from outfit_tpu.iod import api as iod_api
    from outfit_tpu.iod.params import IODParams
    from outfit_tpu.lsq import api as lsq_api
    from outfit_tpu.lsq.config import DifferentialCorrectionConfig
    from outfit_tpu.observer.cache import ObserverCache

    eph = JPLEphem.analytic(53500.0, 61500.0)
    params = IODParams(
        n_noise_realizations=3, precision="mixed", newton_max_it=20,
        max_triplets=2,
    )
    cfg = DifferentialCorrectionConfig(
        divergence_grace_iterations=2, precision="mixed",
        max_newton_iterations=4, prewarm_max_iterations=16,
    )

    def staged_run(ds, timings):
        t0 = time.time()
        cache = ObserverCache.build(ds, eph)
        timings["cache"] = time.time() - t0

        from outfit_tpu.parallel import resolve_mesh

        mesh = resolve_mesh("auto")
        t0 = time.time()
        st = iod_api._fit_full_iod_dispatch(
            ds, eph, params, 7, None, None, cache, mesh
        )
        timings["iod_disp"] = time.time() - t0
        assert st["pending"] is not None

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
                             nact_dev, lsq_out.total_newton_iterations,
                             sig_dev))
        timings["lsq_disp"] = time.time() - t0

        t0 = time.time()
        jax.block_until_ready((st["pending"][-1][3], lsq_pend[-1]))
        timings["devwait"] = time.time() - t0
        t0 = time.time()
        iod_fetched, lsq_fetched = jax.device_get(
            ([o for *_, o in st["pending"]], lsq_pend)
        )
        timings["fetch"] = time.time() - t0

        t0 = time.time()
        # result construction: reuse the production code path by calling
        # fit_lsq again would redo the work; replicate only the dict build
        initial_orbits = iod_api._finalize_iod(st, iod_fetched)
        timings["build"] = time.time() - t0
        return initial_orbits

    # warm pass (compiles)
    ds = bench.synthetic_dataset(n_traj, 12, eph, seed=100)
    t0 = time.time()
    timings = {}
    staged_run(ds, timings)
    print(f"compile+first: {time.time()-t0:.1f}s")

    for rep in range(3):
        ds = bench.synthetic_dataset(n_traj, 12, eph, seed=101 + rep)
        timings = {}
        t0 = time.time()
        staged_run(ds, timings)
        total = time.time() - t0
        detail = " ".join(f"{k}={v*1e3:.0f}ms" for k, v in timings.items())
        print(f"rep{rep}: total={total*1e3:.0f}ms ({n_traj/total:.0f} fits/s) {detail}")

    # reference: the production fit_lsq call itself
    from outfit_tpu.lsq.api import fit_lsq

    for rep in range(2):
        ds = bench.synthetic_dataset(n_traj, 12, eph, seed=104 + rep)
        t0 = time.time()
        cache = ObserverCache.build(ds, eph)
        fit_lsq(ds, eph, params, cfg, seed=7, cache=cache)
        total = time.time() - t0
        print(f"fit_lsq rep{rep}: {total*1e3:.0f}ms ({n_traj/total:.0f} fits/s)")


if __name__ == "__main__":
    main()
