"""Two-body propagation of equinoctial elements with analytic Jacobians.

Behavioral parity with ``EquinoctialElements::propagate_twobody``
(``src/orbit_type/equinoctial_element.rs:809-867``):

1. mean motion n = sqrt(mu/a^3); lambda(t1) = lambda0 + n (t1 - t0),
2. generalized Kepler equation F - k sin F + h cos F = lambda(t1), Newton
   from x0 = pi + varpi (tol 100*eps, max 25 iterations, :326-348),
3. position/velocity from the equinoctial (f, g, w) basis (:639-760),
4. optional analytic 6x3 Jacobians d(pos)/d(elem), d(vel)/d(elem)
   (``compute_derivative`` :442-584).

Batched: elements with any leading shape; (t1 - t0) broadcastable.  The
fixed-iteration masked Newton replaces the reference's early-exit loop.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from outfit_tpu.constants import DPI, GAUSS_GRAV_SQUARED
from outfit_tpu.elements.types import EquinoctialElements
from outfit_tpu.kepler.angles import principal_angle

_EPS = float(jnp.finfo(jnp.float64).eps)


class TwoBodyResult(NamedTuple):
    position: jnp.ndarray  # (..., 3)
    velocity: jnp.ndarray  # (..., 3)
    dpos_delem: jnp.ndarray  # (..., 6, 3)
    dvel_delem: jnp.ndarray  # (..., 6, 3)
    converged: jnp.ndarray  # bool


def solve_generalized_kepler(eq: EquinoctialElements, mean_longitude_t1, max_iter=25):
    """Newton on F - k sin F + h cos F = lambda(t1), x0 = pi + varpi.

    Parity: ``solve_kepler_equation`` (:326-348).  Returns (F, converged).
    """
    eps = float(jnp.finfo(jnp.asarray(mean_longitude_t1).dtype).eps)
    tol = 100.0 * eps

    def body(carry):
        it, f, done = carry
        res = f - eq.k * jnp.sin(f) + eq.h * jnp.cos(f) - mean_longitude_t1
        der = 1.0 - eq.k * jnp.cos(f) - eq.h * jnp.sin(f)
        step = -res / jnp.where(jnp.abs(der) > eps, der, eps)
        fn = jnp.where(done, f, f + step)
        done = done | (jnp.abs(step) <= tol)
        return it + 1, fn, done

    def cond(carry):
        it, _, done = carry
        return (it < max_iter) & ~jnp.all(done)

    e2 = eq.h**2 + eq.k**2
    varpi = jnp.where(
        e2 > 100.0 * _EPS, principal_angle(jnp.arctan2(eq.h, eq.k)), 0.0
    )
    x0 = jnp.pi + varpi
    _, f, done = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.array(0, jnp.int32),
            jnp.broadcast_to(x0, jnp.shape(mean_longitude_t1)),
            jnp.zeros(jnp.shape(mean_longitude_t1), bool),
        ),
    )
    return f, done


def propagate_twobody(
    eq: EquinoctialElements,
    t0,
    t1,
    compute_derivatives: bool = True,
    mu: float = GAUSS_GRAV_SQUARED,
) -> TwoBodyResult:
    """Propagate equinoctial elements to t1 (Cartesian state + partials)."""
    a = eq.semi_major_axis
    h, k, p, q = eq.h, eq.k, eq.p, eq.q
    # Epoch differences are taken at the epochs' own precision (f64 MJDs),
    # THEN cast to the elements' working dtype — f32 cannot hold an absolute
    # MJD to better than ~6 minutes, but holds a day-scale dt to ~1e-5 d.
    dt = jnp.broadcast_to(
        jnp.asarray(t1) - jnp.asarray(t0),
        jnp.broadcast_shapes(jnp.shape(a), jnp.shape(jnp.asarray(t1))),
    )
    wdtype = jnp.result_type(a, h, k)
    if jnp.issubdtype(wdtype, jnp.floating):
        dt = dt.astype(wdtype)

    n = jnp.sqrt(mu / a**3)
    lam1 = eq.mean_longitude + n * dt

    e2 = h * h + k * k
    varpi = jnp.where(e2 > 100.0 * _EPS, principal_angle(jnp.arctan2(h, k)), 0.0)
    lam1 = principal_angle(lam1)
    lam1 = jnp.where(lam1 < varpi, lam1 + DPI, lam1)

    F, converged = solve_generalized_kepler(eq, lam1)

    # --- in-plane coordinates ------------------------------------------------
    beta = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(1.0 - e2, 0.0)))
    bhk = beta * h * k
    sF, cF = jnp.sin(F), jnp.cos(F)

    xe = a * ((1.0 - beta * h * h) * cF + bhk * sF - k)
    ye = a * ((1.0 - beta * k * k) * sF + bhk * cF - h)

    u = 1.0 + p * p + q * q
    inv_u = 1.0 / u
    common = 2.0 * p * q * inv_u
    f_vec = jnp.stack(
        [(1.0 - p * p + q * q) * inv_u, common, -2.0 * p * inv_u], axis=-1
    )
    g_vec = jnp.stack(
        [common, (1.0 + p * p - q * q) * inv_u, 2.0 * q * inv_u], axis=-1
    )

    pos = xe[..., None] * f_vec + ye[..., None] * g_vec

    r = jnp.sqrt(xe * xe + ye * ye)
    v_const = n * a * a / r
    v_xe = v_const * (bhk * cF - (1.0 - beta * h * h) * sF)
    v_ye = v_const * ((1.0 - beta * k * k) * cF - bhk * sF)
    vel = v_xe[..., None] * f_vec + v_ye[..., None] * g_vec

    if not compute_derivatives:
        zero = jnp.zeros(pos.shape[:-1] + (6, 3), pos.dtype)
        return TwoBodyResult(pos, vel, zero, zero, converged)

    # --- analytic partials (compute_derivative :442-584) ---------------------
    w_vec = jnp.stack(
        [2.0 * p * inv_u, -2.0 * q * inv_u, (1.0 - p * p - q * q) * inv_u],
        axis=-1,
    )
    inv_r = 1.0 / r
    inv_1b = 1.0 / (1.0 - beta)
    b3 = beta**3

    tmp1 = lam1 - F
    tmp2 = beta + h * h * b3 * inv_1b
    tmp3 = h * k * b3 * inv_1b
    tmp4 = beta * h - sF
    tmp5 = beta * k - cF
    tmp6 = beta + k * k * b3 * inv_1b
    tmp7 = 1.0 - r / a
    tmp8 = sF - h
    tmp9 = cF - k
    tmp10 = a * cF * inv_r
    tmp11 = a * sF * inv_r
    tmp12 = n * a * a * inv_r

    dtv = dt

    # position partials
    dpos1 = (pos - 1.5 * vel * dtv[..., None]) / a[..., None]
    dx1 = -a * (tmp1 * tmp2 + a * cF * tmp4 * inv_r)
    dx2 = a * (tmp1 * tmp3 - 1.0 + a * cF * tmp5 * inv_r)
    dpos2 = dx1[..., None] * f_vec + dx2[..., None] * g_vec
    dx1 = -a * (tmp1 * tmp3 + 1.0 - a * sF * tmp4 * inv_r)
    dx2 = a * (tmp1 * tmp6 - a * sF * tmp5 * inv_r)
    dpos3 = dx1[..., None] * f_vec + dx2[..., None] * g_vec
    dpos4 = (
        2.0
        * (q[..., None] * (ye[..., None] * f_vec - xe[..., None] * g_vec)
           - xe[..., None] * w_vec)
        * inv_u[..., None]
    )
    dpos5 = (
        2.0
        * (p[..., None] * (-ye[..., None] * f_vec + xe[..., None] * g_vec)
           + ye[..., None] * w_vec)
        * inv_u[..., None]
    )
    dpos6 = vel / n[..., None]

    # velocity partials
    dvel1 = -(vel - 3.0 * mu * pos * dtv[..., None] / (r**3)[..., None]) / (
        2.0 * a[..., None]
    )
    dv1 = tmp12 * (tmp7 * tmp2 + a * a * tmp8 * tmp4 * inv_r**2 + tmp10 * cF)
    dv2 = -tmp12 * (tmp7 * tmp3 + a * a * tmp8 * tmp5 * inv_r**2 - tmp10 * sF)
    dvel2 = dv1[..., None] * f_vec + dv2[..., None] * g_vec
    dv1 = tmp12 * (tmp7 * tmp3 + a * a * tmp9 * tmp4 * inv_r**2 - tmp11 * cF)
    dv2 = -tmp12 * (tmp7 * tmp6 + a * a * tmp9 * tmp5 * inv_r**2 + tmp11 * sF)
    dvel3 = dv1[..., None] * f_vec + dv2[..., None] * g_vec
    dvel4 = (
        2.0
        * (q[..., None] * (v_ye[..., None] * f_vec - v_xe[..., None] * g_vec)
           - v_xe[..., None] * w_vec)
        * inv_u[..., None]
    )
    dvel5 = (
        2.0
        * (p[..., None] * (-v_ye[..., None] * f_vec + v_xe[..., None] * g_vec)
           + v_ye[..., None] * w_vec)
        * inv_u[..., None]
    )
    dvel6 = -(n * a**3)[..., None] * pos * (inv_r**3)[..., None]

    dpos = jnp.stack([dpos1, dpos2, dpos3, dpos4, dpos5, dpos6], axis=-2)
    dvel = jnp.stack([dvel1, dvel2, dvel3, dvel4, dvel5, dvel6], axis=-2)
    return TwoBodyResult(pos, vel, dpos, dvel, converged)
