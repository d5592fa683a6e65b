"""Measure TPU while-loop per-iteration overhead vs body size.

Times lax.while_loop with a trivial 1-op body and with a single_iteration
body at bench shapes, for two trip counts — the slope separates fixed
per-iteration overhead from body compute.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(f, *a):
    import jax

    out = f(*a)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    import bench
    bench._enable_compile_cache()

    T, N = 2048, 12
    x = jnp.asarray(np.random.default_rng(0).uniform(1, 2, (T, N)))

    @partial(jax.jit, static_argnames=("n",))
    def trivial(x, n):
        def body(c):
            i, x = c
            return i + 1, x * 1.000001 + 1e-9

        def cond(c):
            return c[0] < n

        return jax.lax.while_loop(cond, body, (jnp.array(0, jnp.int32), x))[1]

    for n in (8, 64):
        t = timed(trivial, x, n)
        print(f"trivial while n={n:3d}: {t*1e3:8.2f} ms", flush=True)

    # single_iteration body in a counted while loop (mixed-mode config)
    from outfit_tpu.lsq.iteration import ObsArrays, single_iteration
    from outfit_tpu.lsq.config import DifferentialCorrectionConfig

    cfg = DifferentialCorrectionConfig(precision="mixed")
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

    @partial(jax.jit, static_argnames=("n", "jac32"))
    def iter_loop(el, n, jac32):
        def body(c):
            i, e, kep = c
            res = single_iteration(
                e, ep, sel, obs, free, None, None,
                jnp.float32 if jac32 else None,
                kepler_warm=(kep[..., 0], kep[..., 1], kep[..., 2]),
            )
            return i + 1, res.corrected, res.kepler

        def cond(c):
            return c[0] < n

        k0 = jnp.full((T, N, 3), jnp.nan)
        return jax.lax.while_loop(cond, body, (jnp.array(0, jnp.int32), el, k0))[1]

    for jac32 in (True, False):
        for n in (1, 4):
            t = timed(iter_loop, el0, n, jac32)
            print(
                f"single_iteration loop n={n} jac32={jac32}: {t*1e3:8.2f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
