"""Device cost of the fused triplet enumerator at real-cadence shapes.

The enumerator materializes w: (T, C(m_cap,3)) and runs K argmin
re-sweeps; at m_cap=100 that is a 2.6 GB f64 intermediate per pass.
Measures (T, n_max, m_cap, K) combinations to attribute the real-cadence
IOD cost.  Run: python tools/enum_cost.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import bench

    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from outfit_tpu.iod.triplets import _enum_device_jit

    rng = np.random.default_rng(0)

    def run(T, n_max, count, K, m_cap, label):
        ep = np.sort(rng.uniform(57000, 57160, (T, n_max)), axis=1)
        counts = np.full(T, count, np.int64)
        args = dict(
            dt_min=0.03, dt_max=150.0, dtw=20.0, max_obs=100,
            max_triplets=K, m_cap=m_cap,
        )
        out = _enum_device_jit(jnp.asarray(ep), jnp.asarray(counts), **args)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            out = _enum_device_jit(jnp.asarray(ep), jnp.asarray(counts), **args)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        print(f"{label}: {best*1e3:7.1f} ms  (T={T}, C(m={m_cap},3), K={K})",
              flush=True)

    # real-cadence 160-wide chunk (129-obs arcs, downsampled to 100)
    run(2048, 160, 129, 2, 160, "wide  K2 ")
    run(2048, 160, 129, 16, 160, "wide  K16")
    # real-cadence 64-wide chunk (37/61-obs arcs)
    run(4096, 64, 61, 2, 64, "mid   K2 ")
    run(4096, 64, 61, 16, 64, "mid   K16")
    # synthetic 12-obs shape for reference
    run(8192, 16, 12, 2, 16, "narrow K2")


if __name__ == "__main__":
    main()
