"""Decompose one LSQ single_iteration dispatch into timed sub-pieces."""

import os
import sys
import time
from functools import partial

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
    print(f"{name:44s} {best*1e3:8.2f} ms", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp

    import bench
    bench._enable_compile_cache()

    from outfit_tpu.elements.twobody import propagate_twobody
    from outfit_tpu.elements.types import EquinoctialElements
    from outfit_tpu.lsq.iteration import ObsArrays, observation_partials, single_iteration

    T, N = 2048, 12
    rng = np.random.default_rng(3)
    el0 = jnp.asarray(
        np.tile(np.array([2.3, 0.05, 0.1, 0.01, 0.02, 1.0]), (T, 1))
        + 1e-3 * rng.normal(size=(T, 6))
    )
    ep = jnp.asarray(np.full(T, 57000.0))
    mjd = 57000.0 + np.sort(rng.uniform(0, 40, (T, N)), axis=1)
    theta = 2 * np.pi * (mjd - 51544.5) / 365.25
    helio = np.stack(
        [np.cos(theta), np.sin(theta) * 0.9175, np.sin(theta) * 0.3978], axis=2
    )
    obs = ObsArrays(
        jnp.asarray(mjd),
        jnp.asarray(rng.uniform(0, 2 * np.pi, (T, N))),
        jnp.asarray(rng.uniform(-1.0, 1.0, (T, N))),
        jnp.asarray(np.full((T, N), 2.4e-6)),
        jnp.asarray(np.full((T, N), 2.4e-6)),
        jnp.asarray(helio),
        jnp.asarray(np.ones((T, N), bool)),
    )
    free = jnp.ones(6, bool)
    sel = jnp.zeros((T, N), jnp.int32)

    def eqexp(el):
        return EquinoctialElements(
            ep[:, None], el[:, None, 0], el[:, None, 1], el[:, None, 2],
            el[:, None, 3], el[:, None, 4], el[:, None, 5],
        )

    timed("propagate f64 fwd (no deriv)",
          lambda el: propagate_twobody(eqexp(el), ep[:, None], obs.mjd,
                                       compute_derivatives=False).position, el0)
    el32 = el0.astype(jnp.float32)

    def prop32(el):
        eq = EquinoctialElements(
            ep[:, None], el[:, None, 0], el[:, None, 1], el[:, None, 2],
            el[:, None, 3], el[:, None, 4], el[:, None, 5],
        )
        st = propagate_twobody(eq, ep[:, None], obs.mjd, compute_derivatives=True)
        return st.dpos_delem

    timed("propagate f32 with derivatives", prop32, el32)
    timed("propagate f64 with derivatives",
          lambda el: propagate_twobody(eqexp(el), ep[:, None], obs.mjd,
                                       compute_derivatives=True).dpos_delem, el0)
    timed("observation_partials mixed",
          lambda el: observation_partials(el, ep, obs, None, None, jnp.float32)[2], el0)
    timed("observation_partials pure f64",
          lambda el: observation_partials(el, ep, obs, None, None, None)[2], el0)
    timed("single_iteration mixed",
          lambda el: single_iteration(el, ep, sel, obs, free, None, None,
                                      jnp.float32).corrected, el0)
    timed("single_iteration pure f64",
          lambda el: single_iteration(el, ep, sel, obs, free, None, None,
                                      None).corrected, el0)


if __name__ == "__main__":
    main()
