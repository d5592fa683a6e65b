"""End-to-end batch IOD over MPC 80-column files.

Parity: ``examples/run_full_iod.rs`` / ``run_full_iod_parallel.rs`` — the
reference's sequential vs rayon-parallel split collapses here: the batched
device kernel IS the parallel path, with bitwise-deterministic results
regardless of batch composition.

Usage:
    python examples/run_full_iod.py [files.obs ...] [--lsq] [--seed N]
"""

import argparse
import sys
import time
from collections import Counter

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "files",
        nargs="*",
        default=[
            "tests/data/2015AB.obs",
            "tests/data/8467.obs",
            "tests/data/33803.obs",
            "tests/data/K25D50B.obs",
        ],
    )
    ap.add_argument("--lsq", action="store_true", help="run differential correction too")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import jax.numpy as jnp

    from outfit_tpu.elements.types import EquinoctialElements, equinoctial_to_keplerian
    from outfit_tpu.ephem import JPLEphem
    from outfit_tpu.iod import IODParams, fit_full_iod
    from outfit_tpu.observations import ErrorModel, ObsDataset

    t0 = time.time()
    eph = JPLEphem.new("analytic:builtin")
    ds = ObsDataset.from_mpc_80_col_files(args.files)
    print(f"loaded {len(ds)} observations / {ds.n_trajectories} trajectories "
          f"from {len(args.files)} files ({time.time()-t0:.1f}s)")

    t0 = time.time()
    if args.lsq:
        from outfit_tpu.lsq import fit_lsq

        results = fit_lsq(ds, eph, IODParams(), seed=args.seed,
                          error_model=ErrorModel.fcct14())
    else:
        results = fit_full_iod(ds, eph, IODParams(), seed=args.seed,
                               error_model=ErrorModel.fcct14())
    print(f"fit in {time.time()-t0:.1f}s\n")

    # success/error histogram, parity: run_full_iod_parallel.rs:131-210
    outcomes = Counter()
    rms_values = []
    for tid, r in sorted(results.items()):
        if args.lsq:
            ok = r.ok and not r.fell_back_to_iod
            quality = r.normalised_rms
            label = "LSQ" if ok else (f"IOD-fallback({r.error})" if r.ok else r.error)
        else:
            ok = r.ok
            quality = r.rms
            label = ("corrected" if r.corrected else "prelim") if ok else r.error
        outcomes[label.split("(")[0] if label else "?"] += 1
        if ok and np.isfinite(quality):
            rms_values.append(quality)
        if r.ok and r.equinoctial is not None:
            kep = equinoctial_to_keplerian(
                EquinoctialElements(r.epoch, *map(jnp.float64, r.equinoctial))
            )
            print(f"  {tid:12s} {label:14s} quality={quality:10.4f} "
                  f"a={float(kep.semi_major_axis):8.4f} AU  "
                  f"e={float(kep.eccentricity):6.4f}  "
                  f"i={np.degrees(float(kep.inclination)):7.3f} deg")
        else:
            print(f"  {tid:12s} FAILED: {r.error}")

    print("\noutcomes:", dict(outcomes))
    if rms_values:
        print(f"quality: min={min(rms_values):.4f} "
              f"median={np.median(rms_values):.4f} max={max(rms_values):.4f}")


if __name__ == "__main__":
    main()
