"""Orbit-based observatory site solution from fixture astrometry.

Three MPC codes in tests/data/33803.obs (O18, P07, W24, all assigned
~2024) are newer than any offline source available to this build, so their
embedded coordinates were best-effort guesses.  This tool derives them
from the data itself:

1. fit 33803's orbit (N-body) on the observations from WELL-KNOWN sites
   only (G96, F51, F52, T05, T08, M22, W68, D29 — all in the embedded
   catalog with good coordinates),
2. propagate that fixed orbit to the unknown site's epochs ONCE
   (heliocentric state is site-independent),
3. solve (longitude, rho_cos_phi, rho_sin_phi) by weighted least squares
   of the site's residuals — per-candidate cost is a rotation + an
   aberration correction + atan2, so the optimizer runs in milliseconds.

The topocentric signal for a main-belt object at ~1.3 AU is ~6.6 arcsec
per Earth radius, two orders above the fitted orbit's residual floor; the
diurnal signature over multiple nights pins the longitude to well under
a degree.

Usage: python tools/solve_site.py [code ...]   (default: O18 P07 W24)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

UNKNOWN = sys.argv[1:] or ["O18", "P07", "W24"]
FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", "33803.obs",
)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from outfit_tpu.constants import ERAU, ROT_ECLMJ2000_TO_EQUMJ2000, VLIGHT_AU
    from outfit_tpu.ephem import Body, JPLEphem
    from outfit_tpu.ephemeris.compute import _propagate_equ
    from outfit_tpu.frames import RefEpoch, RefSystem, rotmt, rotpn
    from outfit_tpu.iod.params import IODParams
    from outfit_tpu.lsq.api import fit_lsq
    from outfit_tpu.lsq.config import DifferentialCorrectionConfig
    from outfit_tpu.observations.dataset import ObsDataset
    from outfit_tpu.observations.error_model import ErrorModel
    from outfit_tpu.observer.geometry import gast
    from outfit_tpu.propagator.config import NBodyConfig, PropagatorKind
    from outfit_tpu.time.scales import Ut1Provider
    from outfit_tpu.utils.linalg import matmul_small

    nbody = PropagatorKind(
        nbody=True,
        config=NBodyConfig(
            perturbing_bodies=tuple(
                int(b)
                for b in (
                    Body.SUN, Body.JUPITER_BARY, Body.SATURN_BARY,
                    Body.MARS_BARY, Body.VENUS_BARY, Body.EMB,
                )
            ),
            frozen_perturbers=False,
        ),
    )

    ds = ObsDataset.from_mpc_80_col(FIXTURE)
    ds.apply_error_model(ErrorModel.vfcc17())
    codes = np.array([ds.observers[i].code for i in ds.observer_index])
    known_mask = ~np.isin(codes, UNKNOWN)
    print(f"{known_mask.sum()} known-site obs, {len(codes)-known_mask.sum()} "
          f"unknown-site obs ({sorted(set(codes[~known_mask]))})")

    eph = JPLEphem.analytic(60000.0, 60800.0)
    ds_known = ds.subset(np.nonzero(known_mask)[0])

    cfg = DifferentialCorrectionConfig(
        divergence_grace_iterations=2, propagator=nbody,
        rms_divergence_ratio=10.0,
    )
    res = fit_lsq(
        ds_known, eph, IODParams(max_triplets=16, n_noise_realizations=0),
        cfg, seed=7,
    )
    r = next(iter(res.values()))
    assert r.ok and not r.fell_back_to_iod, (r.error, r.ok)
    print(f"orbit: nRMS {r.normalised_rms:.3f}  epoch {r.epoch:.4f}  "
          f"eq {np.array2string(np.asarray(r.equinoctial), precision=8)}")
    elements = r.orbital_elements

    rot_e2q = np.asarray(ROT_ECLMJ2000_TO_EQUMJ2000)
    ut1 = Ut1Provider()

    def site_tables(mjds):
        """Per-epoch, site-independent precomputation: asteroid state,
        Earth state, and the body-fixed -> ecliptic-J2000 rotation."""
        ast_pos, ast_vel, conv = _propagate_equ(
            elements, jnp.asarray(mjds), nbody, eph
        )
        assert bool(np.asarray(conv).all())
        g = gast(mjds, ut1)
        rot_earth = rotmt(-jnp.asarray(g), 2)
        rot_frame = rotpn(
            RefSystem.equt(RefEpoch.of_date(jnp.asarray(mjds))),
            RefSystem.eclm(RefEpoch.j2000()),
        )
        m = np.asarray(matmul_small(rot_frame, rot_earth))  # (n, 3, 3)
        earth_equ, _ = eph.earth_ephemeris(jnp.asarray(mjds))
        return (
            np.asarray(ast_pos), np.asarray(ast_vel), m, np.asarray(earth_equ)
        )

    def residual_fn(mjds, ra_o, dec_o, sig):
        ast_pos, ast_vel, m, earth_equ = site_tables(mjds)

        def residuals(site_vec):
            lon, rc, rs = site_vec
            fixed = ERAU * np.array(
                [rc * np.cos(lon), rc * np.sin(lon), rs]
            )
            geo_ecl = m @ fixed  # (n, 3)
            obs_pos = earth_equ + geo_ecl @ rot_e2q.T
            topo = ast_pos - obs_pos
            dt = np.linalg.norm(topo, axis=-1, keepdims=True) / VLIGHT_AU
            topo = topo - dt * ast_vel  # first-order aberration
            ra_p = np.arctan2(topo[:, 1], topo[:, 0]) % (2 * np.pi)
            dec_p = np.arctan2(
                topo[:, 2], np.hypot(topo[:, 0], topo[:, 1])
            )
            dra = (ra_p - ra_o + np.pi) % (2 * np.pi) - np.pi
            return np.concatenate(
                [dra * np.cos(dec_o) / sig, (dec_p - dec_o) / sig]
            )

        return residuals

    from scipy.optimize import least_squares

    for code in UNKNOWN:
        m_sel = codes == code
        if not m_sel.any():
            print(f"{code}: no observations, skipping")
            continue
        mjds = ds.mjd_tt[m_sel]
        ra_o = ds.ra[m_sel]
        dec_o = ds.dec[m_sel]
        sig = ds.ra_error[m_sel]
        residuals = residual_fn(mjds, ra_o, dec_o, sig)
        frac = mjds % 1.0
        print(f"\n=== {code}: {m_sel.sum()} obs, UT frac range "
              f"{frac.min():.3f}-{frac.max():.3f}")

        # coarse longitude x latitude grid to find the basin
        best = None
        for lon_deg in range(0, 360, 5):
            for lat in (-0.7, -0.35, 0.0, 0.35, 0.7):
                rc = float(np.sqrt(1.0 - lat**2))
                v = residuals((np.deg2rad(lon_deg), rc, lat))
                c = float(v @ v)
                if best is None or c < best[0]:
                    best = (c, np.deg2rad(lon_deg), rc, lat)
        print(f"grid best: lon {np.rad2deg(best[1]):.0f} deg, "
              f"rs {best[3]:+.2f}, cost {best[0]:.3e}")

        sol = least_squares(
            residuals, x0=[best[1], best[2], best[3]], method="lm", xtol=1e-14,
        )
        lon, rc, rs = sol.x
        lon %= 2 * np.pi
        rms = np.sqrt(np.mean(sol.fun**2))
        print(
            f"free   {code}: lon {np.rad2deg(lon):.4f} E  rho_cos {rc:.6f}  "
            f"rho_sin {rs:+.6f}  weighted RMS {rms:.2f} sigma"
        )

        # ellipsoid-constrained solve (lon, geodetic lat, h in [0, 5500] m):
        # short single-night arcs leave the radial parallax component nearly
        # degenerate, so the free solution can drift off the ellipsoid; the
        # constrained one is what goes in the catalog.
        from outfit_tpu.observations.observatories import parallax_from_geodetic

        def resid_geo(x):
            lo, cc, ss = parallax_from_geodetic(x[0], x[1], x[2])
            return residuals((lo, cc, ss))

        g = least_squares(
            resid_geo,
            x0=[np.rad2deg(lon), np.rad2deg(np.arctan2(rs, rc)), 1500.0],
            bounds=([-360.0, -89.9, 0.0], [720.0, 89.9, 5500.0]),
            xtol=1e-14, method="trf",
        )
        lon_d, lat_d, h = g.x
        lon_d %= 360.0
        rms_g = np.sqrt(np.mean(g.fun**2))
        lo, cc, ss = parallax_from_geodetic(lon_d, lat_d, h)
        print(
            f"SOLVED {code}: lon {lon_d:.4f} E  lat {lat_d:+.4f}  h {h:.0f} m"
            f"  -> rho_cos {cc:.6f}  rho_sin {ss:+.6f}"
            f"  weighted RMS {rms_g:.2f} sigma (ellipsoid-constrained)"
        )


if __name__ == "__main__":
    main()
