"""Sub-stage profile of _fit_full_iod_dispatch host prep on the TPU.

python tools/disp_profile.py [n_traj]
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
    import jax.numpy as jnp

    from outfit_tpu.ephem import JPLEphem
    from outfit_tpu.iod import api as iod_api
    from outfit_tpu.iod.params import IODParams
    from outfit_tpu.iod.triplets import generate_triplet_indices_device
    from outfit_tpu.observer.cache import ObserverCache

    eph = JPLEphem.analytic(53500.0, 61500.0)
    params = IODParams(
        n_noise_realizations=3, precision="mixed", newton_max_it=20,
        max_triplets=2,
    ).validated()

    def staged(ds, cache):
        t = {}
        t0 = time.time()
        lay = iod_api.padded_dataset_arrays(ds, with_values=False)
        t["layout"] = time.time() - t0

        Tall = ds.n_trajectories
        Tb_all = iod_api._bucket(Tall)
        counts_all = lay.counts
        n_max = lay.n_max
        m_cap = int(min(n_max, -(-int(counts_all.max(initial=3)) // 8) * 8))
        t0 = time.time()
        ep_dev = jnp.asarray(
            np.concatenate([lay.mjd, np.zeros((Tb_all - Tall, n_max))])
        )
        cnt_dev = jnp.asarray(
            np.concatenate([counts_all, np.zeros(Tb_all - Tall, np.int64)]).astype(np.int32)
        )
        trips_dev, ktrips_dev = generate_triplet_indices_device(
            ep_dev, cnt_dev, params.dt_min, params.dt_max_triplet,
            params.optimal_interval_time, params.max_obs_for_triplets,
            params.max_triplets, m_cap=m_cap,
        )
        t["enum_disp"] = time.time() - t0
        t0 = time.time()
        trips_all, ktrips_all = jax.device_get((trips_dev, ktrips_dev))
        t["enum_fetch"] = time.time() - t0

        t0 = time.time()
        base = iod_api.device_base_arrays(ds, cache)
        t["base_upload"] = time.time() - t0
        return t

    for rep in range(4):
        ds = bench.synthetic_dataset(n_traj, 12, eph, seed=200 + rep)
        t0 = time.time()
        cache = ObserverCache.build(ds, eph)
        tc = time.time() - t0
        t = staged(ds, cache)
        detail = " ".join(f"{k}={v*1e3:.0f}ms" for k, v in t.items())
        print(f"rep{rep}: cache={tc*1e3:.0f}ms {detail}")

    # cache build sub-cost: how much is the eager slicing?
    ds = bench.synthetic_dataset(n_traj, 12, eph, seed=300)
    t0 = time.time()
    cache = ObserverCache.build(ds, eph)
    print(f"cache cold-shape: {time.time()-t0:.2f}s")
    t0 = time.time()
    cache = ObserverCache.build(ds, eph)
    print(f"cache warm rebuild: {(time.time()-t0)*1e3:.0f}ms")


if __name__ == "__main__":
    main()
