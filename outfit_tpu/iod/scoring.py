"""Batched apparent positions and RMS orbit scoring.

Behavioral parity:

* apparent position core: ``topocentric_radec_and_partials``
  (``src/ephemeris/observation_ephemeris.rs:222-275``) with first-order
  aberration (``aberration.rs:112``),
* ``ephemeris_error`` (:388-416): (cos(dec) dRA/sigma_RA)^2 + (dDec/sigma)^2
  with RA wrapping,
* ``rms_orbit_error`` (``trajectory.rs:352-427``): RMS over the triplet's
  time window, denominator 2N.  The reference's early-prune cutoff is
  replaced by full masked evaluation (cheap when batched).

Elements are equinoctial in the ECLIPTIC J2000 frame (the pipeline
convention); states are rotated to equatorial before topocentric geometry.
Non-elliptic candidates (e >= 1) score +inf, mirroring the reference's
``check_elliptical_orbit`` error path.
"""

import jax.numpy as jnp

from outfit_tpu.constants import ROT_ECLMJ2000_TO_EQUMJ2000, VLIGHT_AU, DPI
from outfit_tpu.elements.twobody import propagate_twobody
from outfit_tpu.elements.types import EquinoctialElements
from outfit_tpu.utils.linalg import rotate3


def correct_aberration_first_order(relative, velocity):
    """d' = d - (|d|/c) * v.  Parity: ``aberration.rs:112``."""
    dist = jnp.linalg.norm(relative, axis=-1, keepdims=True)
    return relative - dist / VLIGHT_AU * velocity


def apparent_radec(ast_pos_equ, ast_vel_equ, obs_pos_equ):
    """Topocentric (RA, Dec) with first-order aberration, batched."""
    rel = ast_pos_equ - obs_pos_equ
    cor = correct_aberration_first_order(rel, ast_vel_equ)
    x, y, z = cor[..., 0], cor[..., 1], cor[..., 2]
    rho_xy = jnp.hypot(x, y)
    dec = jnp.arctan2(z, rho_xy)
    ra = jnp.arctan2(y, x) % DPI
    return ra, dec


def ephemeris_error_terms(
    eq: EquinoctialElements,
    obs_mjd,
    obs_ra,
    obs_dec,
    sig_ra,
    sig_dec,
    obs_helio_pos_equ,
):
    """Per-observation weighted squared residuals for batched elements.

    Shapes broadcast: elements fields (...,), obs arrays (..., N) (or any
    common broadcast), obs_helio_pos (..., N, 3).  Returns (..., N) terms.
    """
    st = propagate_twobody(
        EquinoctialElements(
            eq.reference_epoch,
            eq.semi_major_axis[..., None],
            eq.h[..., None],
            eq.k[..., None],
            eq.p[..., None],
            eq.q[..., None],
            eq.mean_longitude[..., None],
        ),
        eq.reference_epoch[..., None],
        obs_mjd,
        compute_derivatives=False,
    )
    rot = jnp.asarray(ROT_ECLMJ2000_TO_EQUMJ2000, st.position.dtype)
    pos_equ = rotate3(rot, st.position)
    vel_equ = rotate3(rot, st.velocity)
    ra, dec = apparent_radec(pos_equ, vel_equ, obs_helio_pos_equ)

    diff_ra = (obs_ra - ra) % DPI
    diff_ra = jnp.where(diff_ra > jnp.pi, diff_ra - DPI, diff_ra)
    diff_dec = obs_dec - dec
    term_ra = (jnp.cos(obs_dec) * diff_ra / sig_ra) ** 2
    term_dec = (diff_dec / sig_dec) ** 2
    # an unconverged generalized-Kepler solve leaves stale (F, sinF, cosF):
    # the angles are garbage, not merely imprecise — score them inf so a
    # failed propagation can never outrank a converged candidate (errors-as-
    # data; parity with the reference's per-obs propagation Err path)
    return jnp.where(st.converged, term_ra + term_dec, jnp.inf)


def rms_orbit_error(
    eq: EquinoctialElements,
    obs_mjd,
    obs_ra,
    obs_dec,
    sig_ra,
    sig_dec,
    obs_helio_pos_equ,
    window_mask,
):
    """Masked-window RMS = sqrt(sum(terms) / (2 N)).  +inf when the orbit is
    non-elliptic or the window is empty."""
    terms = ephemeris_error_terms(
        eq, obs_mjd, obs_ra, obs_dec, sig_ra, sig_dec, obs_helio_pos_equ
    )
    terms = jnp.where(window_mask, terms, 0.0)
    n = jnp.sum(window_mask, axis=-1)
    denom = 2.0 * jnp.maximum(n, 1)
    rms = jnp.sqrt(jnp.sum(terms, axis=-1) / denom)
    elliptic = eq.eccentricity() < 1.0
    ok = elliptic & (n > 0) & jnp.isfinite(rms)
    return jnp.where(ok, rms, jnp.inf)
