"""In-loop marginal cost of LSQ iteration body pieces.

Each variant runs inside a counted while_loop at two trip counts; the slope
(t6 - t2)/4 is the clean per-iteration cost of that body, immune to the
dispatch/upload overhead that pollutes standalone timings through the axon
relay.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    bench._enable_compile_cache()

    from outfit_tpu.constants import DPI, ROT_ECLMJ2000_TO_EQUMJ2000, VLIGHT_AU
    from outfit_tpu.elements.twobody import propagate_twobody
    from outfit_tpu.elements.types import EquinoctialElements
    from outfit_tpu.lsq.iteration import ObsArrays, single_iteration
    from outfit_tpu.utils.linalg import cholesky_inverse6

    T, N = 2048, 12
    rng = np.random.default_rng(3)
    el0 = jnp.asarray(
        np.tile(np.array([2.3, 0.05, 0.1, 0.01, 0.02, 1.0]), (T, 1))
        + 1e-3 * rng.normal(size=(T, 6))
    )
    ep = jnp.asarray(np.full(T, 57000.0))
    mjd = jnp.asarray(57000.0 + np.sort(rng.uniform(0, 40, (T, N)), axis=1))
    theta = 2 * np.pi * (np.asarray(mjd) - 51544.5) / 365.25
    helio = jnp.asarray(np.stack(
        [np.cos(theta), np.sin(theta) * 0.9175, np.sin(theta) * 0.3978], axis=2
    ))
    obs = ObsArrays(
        mjd,
        jnp.asarray(rng.uniform(0, 2 * np.pi, (T, N))),
        jnp.asarray(rng.uniform(-1.0, 1.0, (T, N))),
        jnp.asarray(np.full((T, N), 2.4e-6)),
        jnp.asarray(np.full((T, N), 2.4e-6)),
        helio,
        jnp.asarray(np.ones((T, N), bool)),
    )
    free = jnp.ones(6, bool)
    sel = jnp.zeros((T, N), jnp.int32)

    def eqexp(el, dt=None):
        if dt is not None:
            el = el.astype(dt)
        return EquinoctialElements(
            ep[:, None], el[:, None, 0], el[:, None, 1], el[:, None, 2],
            el[:, None, 3], el[:, None, 4], el[:, None, 5],
        )

    def loop(body, el, n):
        def b(c):
            i, e = c
            return i + 1, body(e)

        return jax.lax.while_loop(lambda c: c[0] < n, b, (jnp.array(0, jnp.int32), el))[1]

    # build per-variant jitted loops explicitly
    def make(body):
        @partial(jax.jit, static_argnames=("n",))
        def f(el, n):
            return loop(body, el, n)

        return f

    def norm_keep(x):
        """Map any (T,...) result back to a (T,6) carry so the loop chains."""
        flat = x.reshape(T, -1)[:, :1]
        return el0 + 1e-18 * flat

    variants = {}

    # --- primitive op costs, marginal in-loop (immune to dispatch artifacts)
    x0 = mjd / 57000.0  # O(1) values
    variants["op: 10x fma"] = lambda e: norm_keep(
        sum(x0 * (1.0 + 1e-9 * i) for i in range(10)) + e[:, :1]
    )
    variants["op: floor(x*c)"] = lambda e: norm_keep(
        jnp.floor(x0 * e[:, :1]) + e[:, :1]
    )
    variants["op: div"] = lambda e: norm_keep(x0 / (e[:, :1] + 2.0))
    variants["op: sqrt"] = lambda e: norm_keep(jnp.sqrt(x0 + e[:, :1] ** 2))
    variants["op: atan2 (T,N)"] = lambda e: norm_keep(
        jnp.arctan2(x0 + e[:, :1], 1.0 + x0)
    )
    variants["op: sin (T,N)"] = lambda e: norm_keep(jnp.sin(x0 + e[:, :1]))
    variants["op: mod DPI"] = lambda e: norm_keep((x0 + e[:, :1]) % DPI)
    variants["op: pow3 + div"] = lambda e: norm_keep(
        1.0 / (x0 + e[:, :1]) ** 3
    )

    variants["fwd f64 (no deriv)"] = lambda e: norm_keep(
        propagate_twobody(eqexp(e), ep[:, None], mjd, compute_derivatives=False).position
    )
    variants["fwd+deriv f64"] = lambda e: norm_keep(
        propagate_twobody(eqexp(e), ep[:, None], mjd, compute_derivatives=True).dpos_delem
    )
    variants["fwd+deriv f32"] = lambda e: norm_keep(
        propagate_twobody(eqexp(e, jnp.float32), ep[:, None], mjd,
                          compute_derivatives=True).dpos_delem.astype(jnp.float64)
    )

    def resid_chain(e):
        st = propagate_twobody(eqexp(e), ep[:, None], mjd, compute_derivatives=False)
        rot = jnp.asarray(ROT_ECLMJ2000_TO_EQUMJ2000)
        pos = jnp.einsum("ij,...j->...i", rot, st.position)
        vel = jnp.einsum("ij,...j->...i", rot, st.velocity)
        rel = pos - helio
        rel_norm = jnp.linalg.norm(rel, axis=-1)
        cor = rel - (rel_norm[..., None] / VLIGHT_AU) * vel
        ra = jnp.arctan2(cor[..., 1], cor[..., 0]) % DPI
        dec = jnp.arctan2(cor[..., 2], jnp.hypot(cor[..., 0], cor[..., 1]))
        return norm_keep(ra + dec)

    variants["fwd f64 + residual chain"] = resid_chain

    def chol_only(e):
        m = jnp.einsum("tj,tk->tjk", e, e) + jnp.eye(6)
        inv, ok = cholesky_inverse6(m)
        return norm_keep(inv)

    variants["cholesky6 only"] = chol_only

    variants["full single_iteration mixed"] = lambda e: single_iteration(
        e, ep, sel, obs, free, None, None, jnp.float32
    ).corrected
    variants["full single_iteration f64"] = lambda e: single_iteration(
        e, ep, sel, obs, free, None, None, None
    ).corrected

    for name, body in variants.items():
        f = make(body)
        ts = {}
        for n in (2, 6):
            out = f(el0, n)
            jax.block_until_ready(out)
            best = 1e9
            for _ in range(4):
                t0 = time.perf_counter()
                jax.block_until_ready(f(el0, n))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        print(
            f"{name:32s} per-iter {(ts[6]-ts[2])/4*1e3:7.2f} ms   "
            f"(t2 {ts[2]*1e3:6.1f} t6 {ts[6]*1e3:6.1f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
