"""Batched apparent-position + geometry kernel.

Behavioral parity:

* ``ApparentPosition`` (``apparent_position.rs:67-79``): RA/Dec (equatorial
  J2000) + geocentric and heliocentric distances,
* first/second-order aberration (``aberration.rs:112-234``; second order =
  two-pass Keplerian retro-propagation with the two-body propagator),
* ``BodyGeometry`` (``geometry.rs:107-239``): phase angle, solar elongation,
  topocentric radial velocity, dRA/dt, dDec/dt with clamped acos and the
  true topocentric velocity v_body - v_obs,
* e >= 1 precheck (``observation_ephemeris.rs:288-296``): flagged per lane.

Batched over any common leading shape of (elements, epochs, observer states).
"""

from typing import NamedTuple

import jax.numpy as jnp

from outfit_tpu.constants import DPI, ROT_ECLMJ2000_TO_EQUMJ2000, VLIGHT_AU
from outfit_tpu.elements.twobody import propagate_twobody
from outfit_tpu.elements.types import EquinoctialElements
from outfit_tpu.ephemeris.config import AberrationOrder
from outfit_tpu.propagator.config import PropagatorKind


class ApparentPosition(NamedTuple):
    ra: jnp.ndarray
    dec: jnp.ndarray
    geocentric_distance: jnp.ndarray
    heliocentric_distance: jnp.ndarray


class BodyGeometry(NamedTuple):
    phase_angle: jnp.ndarray
    solar_elongation: jnp.ndarray
    radial_velocity: jnp.ndarray
    d_ra_dt: jnp.ndarray
    d_dec_dt: jnp.ndarray


class EphemerisOutput(NamedTuple):
    position: ApparentPosition
    geometry: BodyGeometry
    ok: jnp.ndarray  # per-lane validity (elliptic + converged)


def _broadcast_elements(eq: EquinoctialElements, shape):
    return EquinoctialElements(*[jnp.broadcast_to(f, shape) for f in eq])


def _propagate_equ(eq: EquinoctialElements, epochs, propagator, ephem):
    """Heliocentric state at the epochs, rotated to equatorial J2000."""
    if propagator.nbody:
        from outfit_tpu.propagator.nbody import propagate_nbody

        st = propagate_nbody(eq, epochs, ephem, propagator.config)
        pos_ecl, vel_ecl, conv = st.position, st.velocity, st.status == 0
    else:
        st = propagate_twobody(eq, eq.reference_epoch, epochs, compute_derivatives=False)
        pos_ecl, vel_ecl, conv = st.position, st.velocity, st.converged
    rot = jnp.asarray(ROT_ECLMJ2000_TO_EQUMJ2000)
    return (
        jnp.sum(rot * pos_ecl[..., None, :], -1),
        jnp.sum(rot * vel_ecl[..., None, :], -1),
        conv,
    )


def _aberrated_topocentric(
    eq, epochs, ast_pos, ast_vel, obs_pos, order: AberrationOrder
):
    topo = ast_pos - obs_pos
    if order == AberrationOrder.FIRST:
        dt = jnp.linalg.norm(topo, axis=-1, keepdims=True) / VLIGHT_AU
        return topo - dt * ast_vel
    # second order: two-pass Keplerian retro-propagation (aberration.rs:197)
    rot = jnp.asarray(ROT_ECLMJ2000_TO_EQUMJ2000)

    def retro(separation):
        t_ret = epochs - separation / VLIGHT_AU
        st = propagate_twobody(eq, eq.reference_epoch, t_ret, compute_derivatives=False)
        return jnp.sum(rot * st.position[..., None, :], -1)

    r1 = retro(jnp.linalg.norm(topo, axis=-1))
    d1 = r1 - obs_pos
    r2 = retro(jnp.linalg.norm(d1, axis=-1))
    return r2 - obs_pos


def compute_apparent(
    eq: EquinoctialElements,
    epochs,
    obs_pos_equ,
    obs_vel_equ,
    propagator: PropagatorKind = PropagatorKind.two_body(),
    aberration: AberrationOrder = AberrationOrder.FIRST,
    ephem=None,
) -> EphemerisOutput:
    """Apparent position + geometry for batched (epoch, observer) lanes.

    ``eq`` fields broadcastable against ``epochs`` (...,);
    ``obs_pos_equ``/``obs_vel_equ`` (..., 3) observer heliocentric states.
    """
    epochs = jnp.asarray(epochs, jnp.float64)
    eqb = _broadcast_elements(eq, jnp.shape(epochs))
    ast_pos, ast_vel, conv = _propagate_equ(eqb, epochs, propagator, ephem)

    topo = _aberrated_topocentric(
        eqb, epochs, ast_pos, ast_vel, obs_pos_equ, aberration
    )
    x, y, z = topo[..., 0], topo[..., 1], topo[..., 2]
    rho_xy = jnp.hypot(x, y)
    rho = jnp.linalg.norm(topo, axis=-1)
    ra = jnp.arctan2(y, x) % DPI
    dec = jnp.arctan2(z, rho_xy)

    r_helio = jnp.linalg.norm(ast_pos, axis=-1)
    r_obs = jnp.linalg.norm(obs_pos_equ, axis=-1)

    pos_out = ApparentPosition(ra, dec, rho, r_helio)

    # geometry (geometry.rs:204-239)
    rho_safe = jnp.where(rho > 0, rho, 1.0)
    cos_phase = jnp.sum(ast_pos * topo, axis=-1) / (
        jnp.where(r_helio > 0, r_helio, 1.0) * rho_safe
    )
    phase = jnp.arccos(jnp.clip(cos_phase, -1.0, 1.0))
    cos_elong = jnp.sum(-obs_pos_equ * topo, axis=-1) / (
        jnp.where(r_obs > 0, r_obs, 1.0) * rho_safe
    )
    elong = jnp.arccos(jnp.clip(cos_elong, -1.0, 1.0))

    v_topo = ast_vel - obs_vel_equ
    rdot = jnp.sum(topo * v_topo, axis=-1) / rho_safe

    rho_xy2 = jnp.maximum(rho_xy * rho_xy, 1e-300)
    d_ra_dt = (x * v_topo[..., 1] - y * v_topo[..., 0]) / rho_xy2
    rho2 = jnp.maximum(rho * rho, 1e-300)
    d_dec_dt = (
        v_topo[..., 2] * rho_xy
        - z * (x * v_topo[..., 0] + y * v_topo[..., 1]) / jnp.maximum(rho_xy, 1e-300)
    ) / rho2

    geom = BodyGeometry(phase, elong, rdot, d_ra_dt, d_dec_dt)

    elliptic = eqb.eccentricity() < 1.0
    ok = conv & elliptic & jnp.isfinite(ra) & (rho > 0)
    return EphemerisOutput(pos_out, geom, ok)
