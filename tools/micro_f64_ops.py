"""Micro-benchmark: relative cost of emulated-f64 primitives on TPU.

Times batched sin/cos/atan2/sqrt/div/fma chains on (1<<20,) f64 and f32
arrays, plus the generalized-Kepler solve, to direct optimization effort
(docs/DESIGN.md roadmap item 4: the LSQ f64 phase).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from outfit_tpu.elements.types import EquinoctialElements
    from outfit_tpu.elements.twobody import solve_generalized_kepler

    n = 1 << 20
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.5, 3.0, n))

    def timed(name, f, *a):
        g = jax.jit(f)
        out = g(*a)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(g(*a))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:28s} {best*1e3:8.2f} ms", file=sys.stderr, flush=True)
        return best

    REP = 16

    def chain(op):
        def f(x):
            y = x
            for _ in range(REP):
                y = op(y)
            return y
        return f

    for dt in (jnp.float64, jnp.float32):
        xx = x.astype(dt)
        print(f"--- dtype {dt.__name__}, {REP}x chained op over {n} lanes ---",
              file=sys.stderr)
        timed("fma (x*1.0000001+1e-9)", chain(lambda y: y * 1.0000001 + 1e-9), xx)
        timed("div (1/(x+2))", chain(lambda y: 1.0 / (y + 2.0)), xx)
        timed("sqrt(x+1)", chain(lambda y: jnp.sqrt(y + 1.0)), xx)
        timed("sin", chain(jnp.sin), xx)
        timed("sincos", chain(lambda y: jnp.sin(y) + jnp.cos(y) * 1e-3), xx)
        timed("atan2(x, 1+x)", chain(lambda y: jnp.arctan2(y, 1.0 + y)), xx)
        timed("exp", chain(jnp.exp), xx)

    # generalized Kepler solve, realistic LSQ shapes (2048 traj x 12 obs)
    T, N = 2048, 12
    h = jnp.asarray(rng.uniform(-0.3, 0.3, (T, 1)) * np.ones((1, N)))
    k = jnp.asarray(rng.uniform(-0.3, 0.3, (T, 1)) * np.ones((1, N)))
    lam = jnp.asarray(rng.uniform(0, 2 * np.pi, (T, N)))
    zero = jnp.zeros((T, N))
    eq = EquinoctialElements(zero, 1.0 + zero, h, k, zero, zero, lam)

    def solve(h, k, lam):
        z = jnp.zeros_like(lam)
        e = EquinoctialElements(z, 1.0 + z, h, k, z, z, lam)
        out = solve_generalized_kepler(e, lam)
        return out[0]

    timed("kepler solve f64 (2048x12)", solve, h, k, lam)
    timed(
        "kepler solve f32 (2048x12)",
        solve,
        h.astype(jnp.float32),
        k.astype(jnp.float32),
        lam.astype(jnp.float32),
    )


if __name__ == "__main__":
    main()
