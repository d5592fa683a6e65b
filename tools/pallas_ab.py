"""A/B: Pallas ephemeris interpolation vs the XLA gather+contract path.

Run on the real TPU:  python tools/pallas_ab.py [n_queries]

Decides VERDICT item 6: either the Pallas kernel goes into the production
path (ObserverCache.build, N-body perturber lookups) or it is retired with
a measured justification.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from outfit_tpu.ephem import Body, JPLEphem
    from outfit_tpu.ephem.chebyshev import interpolate_body
    from outfit_tpu.ephem.pallas_kernel import interpolate_body_pallas

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
    print("backend:", jax.default_backend(), jax.devices())

    eph = JPLEphem.analytic(53500.0, 61500.0)
    tb = eph.tables[Body.EMB]
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.uniform(tb.t0 + 1, tb.t_end - 1, n))

    f_xla = jax.jit(lambda t: interpolate_body(tb, t))
    f_pal = jax.jit(lambda t: interpolate_body_pallas(tb, t))

    for name, f in (("xla", f_xla), ("pallas", f_pal)):
        try:
            t0 = time.time()
            out = f(t)
            jax.block_until_ready(out)
            compile_s = time.time() - t0
            best = np.inf
            for _ in range(5):
                t0 = time.time()
                jax.block_until_ready(f(t))
                best = min(best, time.time() - t0)
            print(f"{name}: compile {compile_s:.1f}s, warm {best*1e3:.3f} ms "
                  f"for {n} queries ({best/n*1e9:.1f} ns/query)")
            if name == "pallas":
                p0, v0 = f_xla(t)
                p1, v1 = out
                err = float(jnp.abs(p1 - p0).max())
                print(f"pallas vs xla max |dpos|: {err:.2e} AU")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
