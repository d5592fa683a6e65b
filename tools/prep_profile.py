"""Host-prep cost profile for fit_full_iod / fit_lsq at survey scale.

Builds a synthetic multi-trajectory dataset (from_dataframe path), then
times the host-side prep stages of the batched pipeline.  Run on CPU:

    JAX_PLATFORMS=cpu python tools/prep_profile.py [n_traj]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_dataset(n_traj: int, n_obs: int = 12, seed: int = 0):
    import pandas as pd

    rng = np.random.default_rng(seed)
    mjd = 57000.0 + np.sort(rng.uniform(0, 40, (n_traj, n_obs)), axis=1)
    df = pd.DataFrame(
        {
            "trajectory_id": np.repeat(
                np.array([f"T{i:06d}" for i in range(n_traj)]), n_obs
            ),
            "mjd_tt": mjd.ravel(),
            "ra": rng.uniform(0, 360, n_traj * n_obs),
            "dec": rng.uniform(-60, 60, n_traj * n_obs),
            "observatory": np.full(n_traj * n_obs, "500"),
        }
    )
    from outfit_tpu.observations import ObsDataset

    t0 = time.time()
    ds = ObsDataset.from_dataframe(df)
    print(f"from_dataframe: {time.time()-t0:.3f}s ({n_traj} traj)")
    return ds


def main():
    n_traj = int(sys.argv[1]) if len(sys.argv) > 1 else 8192

    from outfit_tpu.ephem import JPLEphem
    from outfit_tpu.iod.api import padded_dataset_arrays
    from outfit_tpu.iod.params import IODParams
    from outfit_tpu.iod.triplets import generate_triplet_indices_batch
    from outfit_tpu.observations.error_model import ErrorModel
    from outfit_tpu.observer.cache import ObserverCache

    ds = build_dataset(n_traj)
    eph = JPLEphem.analytic(53500.0, 61500.0)
    params = IODParams(n_noise_realizations=3, max_triplets=2)

    t0 = time.time()
    ds.apply_error_model(ErrorModel.fcct14())
    ds.apply_batch_rms_correction(params.gap_max)
    print(f"error model + batch RMS: {time.time()-t0:.3f}s")

    t0 = time.time()
    cache = ObserverCache.build(ds, eph)
    print(f"observer cache build: {time.time()-t0:.3f}s")

    helio = np.asarray(cache.helio_pos_equ)
    t0 = time.time()
    lay = padded_dataset_arrays(ds, helio)
    t_lay = time.time() - t0
    print(f"padded layout: {t_lay:.3f}s ({t_lay/n_traj*1e6:.1f} us/traj)")

    t0 = time.time()
    trips, ktrips = generate_triplet_indices_batch(
        lay.mjd, lay.counts, params.dt_min, params.dt_max_triplet,
        params.optimal_interval_time, params.max_obs_for_triplets,
        params.max_triplets,
    )
    t_tri = time.time() - t0
    print(f"triplet enumeration: {t_tri:.3f}s ({t_tri/n_traj*1e6:.1f} us/traj)")

    # full prep+dispatch profile via cProfile of fit_full_iod
    import cProfile
    import pstats

    from outfit_tpu.iod.api import fit_full_iod

    t0 = time.time()
    prof = cProfile.Profile()
    prof.enable()
    res = fit_full_iod(ds, eph, params, seed=1, cache=cache)
    prof.disable()
    t_all = time.time() - t0
    nok = sum(r.ok for r in res.values())
    print(
        f"fit_full_iod total: {t_all:.3f}s ({t_all/n_traj*1e6:.1f} us/traj), "
        f"{nok}/{n_traj} ok"
    )
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(18)


if __name__ == "__main__":
    main()
