"""End-to-end ephemeris generation: fit an orbit from MPC observations,
then predict apparent positions + observation geometry over a date range.

Mirrors the reference's ephemeris user story (``src/ephemeris/``): fit ->
``EphemerisRequest`` builder (single / range / explicit epochs per
observer) -> per-entry results with errors-as-data.

Usage:
    python examples/generate_ephemeris.py [file.obs ...]

Defaults to the reference test fixture 2015AB.obs when no files are given.
"""

import sys

sys.path.insert(0, ".")

import numpy as np


def main(argv):
    import outfit_tpu  # noqa: F401  (enables x64)
    from outfit_tpu.conversion import dec_sdms_prec, ra_hms_prec
    from outfit_tpu.ephem import JPLEphem
    from outfit_tpu.ephemeris import (
        EphemerisMode,
        EphemerisRequest,
        compute_ephemeris,
    )
    from outfit_tpu.iod import IODParams
    from outfit_tpu.lsq import DifferentialCorrectionConfig, fit_lsq
    from outfit_tpu.observations import ObsDataset
    from outfit_tpu.observations.observatories import Observer

    files = argv[1:] or ["tests/data/2015AB.obs"]
    ds = ObsDataset.from_mpc_80_col_files(files)
    eph = JPLEphem("analytic:builtin")

    print(f"fitting {ds.n_trajectories} trajectories from {len(files)} file(s)...")
    fits = fit_lsq(
        ds,
        eph,
        iod_params=IODParams(precision="mixed"),
        config=DifferentialCorrectionConfig(
            precision="mixed", divergence_grace_iterations=2
        ),
        seed=0,
    )

    observer = Observer.geocenter()
    for tid, r in sorted(fits.items()):
        if not r.ok:
            print(f"\n{tid}: fit failed ({r.error}) — skipping ephemeris")
            continue
        eq = r.keplerian  # Keplerian view of the fitted orbit
        t0 = float(r.epoch)
        req = EphemerisRequest().add(
            observer, EphemerisMode.range(t0, t0 + 30.0, 5.0)
        )
        res = compute_ephemeris(r.keplerian, req, eph)

        print(f"\n{tid}  (a={float(eq.semi_major_axis):.4f} AU, "
              f"e={float(eq.eccentricity):.4f}, nRMS={r.normalised_rms:.3f})")
        print(f"  {'MJD (TT)':>12s}  {'RA':>13s}  {'Dec':>13s}  "
              f"{'geo dist':>9s}  {'elong':>6s}  {'phase':>6s}")
        for e in res.successes():
            p, g = e.value.position, e.value.geometry
            hh, mm, ss = ra_hms_prec(p.ra, 2)
            sgn, dd, dm, dsec = dec_sdms_prec(p.dec, 1)
            print(f"  {e.epoch:12.3f}  {hh:02d}h{mm:02d}m{ss:05.2f}s  "
                  f"{sgn}{dd:02d}d{dm:02d}'{dsec:04.1f}\"  "
                  f"{p.geocentric_distance:8.4f}AU  "
                  f"{np.degrees(g.solar_elongation):5.1f}d  "
                  f"{np.degrees(g.phase_angle):5.1f}d")
        n_err = sum(1 for _ in res.errors())
        if n_err:
            print(f"  ({n_err} epochs failed)")


if __name__ == "__main__":
    main(sys.argv)
