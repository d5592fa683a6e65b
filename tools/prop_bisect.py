"""Bisect the 24 ms propagate_twobody dispatch at (2048, 12)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(name, f, *a):
    import jax

    g = jax.jit(f)
    out = g(*a)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(g(*a))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best*1e3:8.2f} ms", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp

    import bench
    bench._enable_compile_cache()

    from outfit_tpu.constants import DPI, GAUSS_GRAV_SQUARED
    from outfit_tpu.elements.twobody import propagate_twobody, solve_generalized_kepler
    from outfit_tpu.elements.types import EquinoctialElements
    from outfit_tpu.kepler.angles import principal_angle

    T, N = 2048, 12
    rng = np.random.default_rng(3)
    el0 = jnp.asarray(
        np.tile(np.array([2.3, 0.05, 0.1, 0.01, 0.02, 1.0]), (T, 1))
        + 1e-3 * rng.normal(size=(T, 6))
    )
    ep = jnp.asarray(np.full(T, 57000.0))
    mjd = jnp.asarray(57000.0 + np.sort(rng.uniform(0, 40, (T, N)), axis=1))

    def eqexp(el):
        return EquinoctialElements(
            ep[:, None], el[:, None, 0], el[:, None, 1], el[:, None, 2],
            el[:, None, 3], el[:, None, 4], el[:, None, 5],
        )

    timed("elementwise floor (x*2+1 on (T,N))",
          lambda x: x * 2.0 + 1.0, mjd)

    def prep(el):
        eq = eqexp(el)
        a, h, k = eq.semi_major_axis, eq.h, eq.k
        dt = mjd - ep[:, None]
        n = jnp.sqrt(GAUSS_GRAV_SQUARED / a**3)
        lam1 = eq.mean_longitude + n * dt
        e2 = h * h + k * k
        varpi = jnp.where(e2 > 1e-13, principal_angle(jnp.arctan2(h, k)), 0.0)
        lam1 = principal_angle(lam1)
        lam1 = jnp.where(lam1 < varpi, lam1 + DPI, lam1)
        return lam1

    timed("prep only (lam1)", prep, el0)

    def solve_only(el):
        eq = eqexp(el)
        lam1 = prep(el)
        return solve_generalized_kepler(eq, lam1)[0]

    timed("prep + kepler solve", solve_only, el0)

    timed("full fwd (no deriv)",
          lambda el: propagate_twobody(eqexp(el), ep[:, None], mjd,
                                       compute_derivatives=False).position, el0)

    # N scaling: fixed overhead vs compute
    for n_obs in (48, 192):
        mjd_n = jnp.asarray(
            57000.0 + np.sort(rng.uniform(0, 40, (T, n_obs)), axis=1)
        )
        timed(f"full fwd N={n_obs}",
              lambda el, m=mjd_n: propagate_twobody(
                  eqexp(el), ep[:, None], m, compute_derivatives=False
              ).position, el0)


if __name__ == "__main__":
    main()
