"""Cartesian state -> orbital elements (ccek1) and dynamic acceptability.

Behavioral parity with ``src/orb_elem.rs``: ``ccek1`` (:58-226) classifies
1/a into Keplerian vs Cometary element sets with equatorial and
near-parabolic regularizations; ``eccentricity_control`` (:257-301) derives
(accepted, e, q, energy) from the Lenz-Runge vector.

Batch representation: the reference returns a Rust sum type per state; here a
fixed-shape struct-of-arrays with a per-lane ``kind`` code selects the
meaning of the 6 element slots:

    kind == KIND_KEPLERIAN: (a, e, i, Omega, omega, M)     — elliptic
    kind == KIND_COMETARY:  (q, e, i, Omega, omega, nu)    — parabolic/hyperbolic
"""

from typing import NamedTuple

import jax.numpy as jnp

from outfit_tpu.constants import GAUSS_GRAV_SQUARED
from outfit_tpu.kepler.angles import principal_angle as _wrap

_EPS = float(jnp.finfo(jnp.float64).eps)

KIND_KEPLERIAN = 0
KIND_COMETARY = 1

_EPS_EQ = 1e-15  # equatorial-orbit threshold on sin(i)
_EPS_PARAB = 1e-12  # near-parabolic threshold on 1/a
_EPS_E = 5e-15  # |e - 1| near-parabolic threshold


def eccentricity_control(position, velocity, peri_max, ecc_max):
    """(accepted, eccentricity, perihelion, energy) for batched states.

    Parity: ``src/orb_elem.rs:257-301``.  Degenerate angular momentum lanes
    return accepted=False (the reference returns None there).
    """
    dtype = jnp.result_type(position, velocity)
    if not jnp.issubdtype(dtype, jnp.floating):
        dtype = jnp.float64
    position = jnp.asarray(position, dtype)
    velocity = jnp.asarray(velocity, dtype)
    mu = GAUSS_GRAV_SQUARED

    v2 = jnp.sum(velocity * velocity, axis=-1)
    r = jnp.linalg.norm(position, axis=-1)
    h = jnp.cross(position, velocity)
    h2 = jnp.sum(h * h, axis=-1)
    degenerate = jnp.sqrt(h2) == 0.0

    r_safe = jnp.where(r > 0.0, r, 1.0)
    lenz = jnp.cross(velocity, h) / mu - position / r_safe[..., None]
    ecc = jnp.linalg.norm(lenz, axis=-1)
    peri = h2 / (mu * (1.0 + ecc))
    energy = v2 / 2.0 - mu / r_safe

    accepted = (~degenerate) & (ecc < ecc_max) & (peri < peri_max)
    return accepted, ecc, peri, energy


class StateElements(NamedTuple):
    """Batched output of :func:`ccek1` (see module docstring)."""

    kind: jnp.ndarray  # int32
    elements: jnp.ndarray  # (..., 6)


def ccek1(position, velocity):
    """Cartesian heliocentric state -> orbital elements (batched).

    Parity: ``src/orb_elem.rs:58-226``.  Inputs are expected in the ecliptic
    J2000 frame (the reference rotates equatorial states before calling, see
    ``gauss.rs:906-923``); the routine itself is frame-agnostic.
    """
    dtype = jnp.result_type(position, velocity)
    if not jnp.issubdtype(dtype, jnp.floating):
        dtype = jnp.float64
    position = jnp.asarray(position, dtype)
    velocity = jnp.asarray(velocity, dtype)
    mu = GAUSS_GRAV_SQUARED

    # 1) angular momentum and orbital plane
    h = jnp.cross(position, velocity)
    h2 = jnp.sum(h * h, axis=-1)
    hn = jnp.sqrt(h2)
    hu = h / jnp.where(hn > 0.0, hn, 1.0)[..., None]

    sin_i = jnp.sqrt(hu[..., 0] ** 2 + hu[..., 1] ** 2)
    incl = _wrap(jnp.arctan2(sin_i, hu[..., 2]))
    equatorial = sin_i <= _EPS_EQ
    incl = jnp.where(equatorial, 0.0, incl)
    node = jnp.where(
        equatorial, 0.0, _wrap(jnp.arctan2(hu[..., 0], -hu[..., 1]))
    )

    # 2) rotate into the orbital frame: R = rotmt(i, X) @ rotmt(node, Z)
    ci, si = jnp.cos(incl), jnp.sin(incl)
    cn, sn = jnp.cos(node), jnp.sin(node)

    def rot(v):
        x, y, z = v[..., 0], v[..., 1], v[..., 2]
        x1 = cn * x + sn * y
        y1 = -sn * x + cn * y
        y2 = ci * y1 + si * z
        # z2 (= -si*y1 + ci*z) unused: in-plane scalars only, per reference
        return x1, y2

    px, py = rot(position)
    vx, vy = rot(velocity)

    rv_dot = px * vx + py * vy
    r = jnp.sqrt(px * px + py * py)
    v2 = vx * vx + vy * vy

    inv_a = 2.0 / r - v2 / mu

    # --- elliptic branch -----------------------------------------------------
    a = 1.0 / jnp.where(jnp.abs(inv_a) > _EPS, inv_a, _EPS)
    a_safe = jnp.where(inv_a > _EPS_PARAB, a, 1.0)
    n_mot = jnp.sqrt(mu / a_safe**3)
    e_sin = rv_dot / (n_mot * a_safe * a_safe)
    e_cos = v2 * r / mu - 1.0
    ecc_k = jnp.sqrt(e_sin * e_sin + e_cos * e_cos)

    u = jnp.arctan2(e_sin, e_cos)  # eccentric anomaly
    mean_anom = _wrap(u - ecc_k * jnp.sin(u))

    x1 = jnp.cos(u) - ecc_k
    rad = jnp.sqrt(jnp.maximum(1.0 - ecc_k * ecc_k, 0.0))
    x2 = rad * jnp.sin(u)
    nrm = jnp.sqrt(x1 * x1 + x2 * x2)
    nrm = jnp.where(nrm > 0.0, nrm, 1.0)
    x1n, x2n = x1 / nrm, x2 / nrm
    sin_per = x1n * py - x2n * px
    cos_per = x1n * px + x2n * py
    argp_k = _wrap(jnp.arctan2(sin_per, cos_per))

    # --- cometary branch (parabolic & hyperbolic share the formulas) --------
    p_slr = h2 / mu  # semi-latus rectum
    ec_cos = p_slr / r - 1.0
    ec_sin = rv_dot * p_slr / (jnp.where(hn > 0.0, hn, 1.0) * r)
    nu = jnp.arctan2(ec_sin, ec_cos)
    ecc_c = jnp.sqrt(ec_cos * ec_cos + ec_sin * ec_sin)
    argp_c = _wrap(jnp.arctan2(py, px) - nu)

    parabolic = jnp.abs(inv_a) <= _EPS_PARAB
    near_parab_e = jnp.where(
        inv_a > _EPS_PARAB, jnp.abs(ecc_k - 1.0) < _EPS_E, jnp.abs(ecc_c - 1.0) < _EPS_E
    )
    is_parab = parabolic | near_parab_e

    ecc_out_c = jnp.where(is_parab, 1.0, ecc_c)
    q_c = jnp.where(is_parab, p_slr / 2.0, p_slr / (1.0 + ecc_out_c))

    elliptic = (inv_a > _EPS_PARAB) & ~is_parab

    kind = jnp.where(elliptic, KIND_KEPLERIAN, KIND_COMETARY).astype(jnp.int32)
    e0 = jnp.where(elliptic, a, q_c)
    e1 = jnp.where(elliptic, ecc_k, ecc_out_c)
    e4 = jnp.where(elliptic, argp_k, argp_c)
    e5 = jnp.where(elliptic, mean_anom, nu)
    elements = jnp.stack([e0, e1, incl, node, e4, e5], axis=-1)
    return StateElements(kind, elements)
