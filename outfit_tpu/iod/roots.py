"""Batched Aberth-Ehrlich root finder for the sparse Gauss degree-8 polynomial.

p(x) = x^8 + c6 x^6 + c3 x^3 + c0

Replaces the reference's external ``aberth`` crate (``gauss.rs:648-667``)
with a fixed-iteration simultaneous-root solver in complex128 over any batch
shape.  Root ordering is canonicalized by ascending real part (the crate's
discovery order is initialization-dependent and semantically meaningless).
"""

import jax
import jax.numpy as jnp


def descartes_upper_bound(c0, c3, c6):
    """Upper bound on positive real roots via Descartes' rule of signs.

    Parity: ``descartes_upper_bound_deg8_sparse`` (``gauss.rs:214-240``).
    Sign sequence of [1, c6, c3, c0] by decreasing degree, zeros skipped.
    """
    signs = jnp.stack(
        [jnp.ones_like(c6), jnp.sign(c6), jnp.sign(c3), jnp.sign(c0)], axis=-1
    )

    def count(carry, s):
        prev, cnt = carry
        is_nonzero = s != 0
        change = is_nonzero & (s * prev < 0)
        prev_new = jnp.where(is_nonzero, s, prev)
        return (prev_new, cnt + change.astype(jnp.int32)), None

    init = (signs[..., 0], jnp.zeros(signs.shape[:-1], jnp.int32))
    (_, cnt), _ = jax.lax.scan(
        count, init, jnp.moveaxis(signs[..., 1:], -1, 0)
    )
    return cnt


def aberth_deg8(c0, c3, c6, max_iter: int = 50, eps: float = 1e-6):
    """All 8 complex roots of x^8 + c6 x^6 + c3 x^3 + c0, batched.

    Returns roots (..., 8) complex128, sorted by real part ascending.
    """
    c0 = jnp.asarray(c0, jnp.float64)
    c3 = jnp.asarray(c3, jnp.float64)
    c6 = jnp.asarray(c6, jnp.float64)
    shape = jnp.broadcast_shapes(c0.shape, c3.shape, c6.shape)
    c0, c3, c6 = (jnp.broadcast_to(c, shape) for c in (c0, c3, c6))

    def p(z):
        z3 = z * z * z
        z6 = z3 * z3
        return z6 * z * z + c6[..., None] * z6 + c3[..., None] * z3 + c0[..., None]

    def dp(z):
        z2 = z * z
        z5 = z2 * z2 * z
        return 8.0 * z5 * z2 + 6.0 * c6[..., None] * z5 + 3.0 * c3[..., None] * z2

    # Initial circle: radius from the geometric mean of root magnitudes
    # (|c0|^(1/8)), floored to avoid collapse; Bini-style angular offset.
    r = jnp.maximum(jnp.abs(c0) ** 0.125, 0.3)
    k = jnp.arange(8)
    theta = 2.0 * jnp.pi * k / 8.0 + 0.4
    z = r[..., None] * jnp.exp(1j * theta)

    def body(_, z):
        pz = p(z)
        dpz = dp(z)
        newton = pz / jnp.where(jnp.abs(dpz) > 1e-300, dpz, 1.0)
        diff = z[..., :, None] - z[..., None, :]  # (..., 8, 8)
        diff = jnp.where(jnp.eye(8, dtype=bool), 1.0, diff)
        inv_sum = jnp.sum(
            jnp.where(jnp.eye(8, dtype=bool), 0.0, 1.0 / diff), axis=-1
        )
        denom = 1.0 - newton * inv_sum
        w = newton / jnp.where(jnp.abs(denom) > 1e-300, denom, 1.0)
        # freeze converged roots (relative step at machine precision) to
        # avoid limit-cycle jitter; `eps` (the reference's aberth_eps) is an
        # upper bound only — Aberth is cubically convergent, so running the
        # full fixed iteration count gives full-precision roots.
        conv = jnp.abs(w) <= jnp.minimum(eps, 1e-13) * (1.0 + jnp.abs(z))
        return jnp.where(conv, z, z - w)

    z = jax.lax.fori_loop(0, max_iter, body, z)
    order = jnp.argsort(z.real, axis=-1)
    return jnp.take_along_axis(z, order, axis=-1)
