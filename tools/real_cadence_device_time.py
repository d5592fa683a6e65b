"""Pure device-execution time of the real-cadence IOD chunks.

Captures the exact args of each _iod_kernel_dense dispatch (already
device-resident after the first run), then times repeated invocations —
no host prep, no transfers.  Separates tunnel/transfer cost from kernel
compute.

Run:  python tools/real_cadence_device_time.py [n_traj]
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    n_traj = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

    import bench

    bench._enable_compile_cache()
    import jax

    from outfit_tpu.ephem import JPLEphem
    from outfit_tpu.iod import api as iod_api
    from outfit_tpu.iod.params import IODParams
    from outfit_tpu.observer.cache import ObserverCache
    from outfit_tpu.parallel import resolve_mesh

    eph = JPLEphem.analytic(53500.0, 61500.0)
    params = IODParams(
        n_noise_realizations=3, precision="mixed", newton_max_it=20,
        max_triplets=2,
    )

    captured = []
    real_jit = iod_api._iod_kernel_dense_jit

    def capture(*args, **kw):
        out = real_jit(*args, **kw)
        captured.append((args, kw, out))
        return out

    iod_api._iod_kernel_dense_jit = capture

    ds = bench.real_cadence_dataset(n_traj, seed=101)
    cache = ObserverCache.build(ds, eph)
    mesh = resolve_mesh("auto")
    st = iod_api._fit_full_iod_dispatch(ds, eph, params, 7, None, None, cache, mesh)
    jax.block_until_ready([o for *_, o in st["pending"]])
    iod_api._iod_kernel_dense_jit = real_jit

    print(f"captured {len(captured)} dense dispatches")
    total = 0.0
    for i, (args, kw, out0) in enumerate(captured):
        # device-put everything once so reruns measure pure execution
        args = jax.block_until_ready(
            jax.tree.map(lambda x: x, args)
        )
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            out = real_jit(*args, **kw)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        shp = args[1].shape  # glob_idx_g
        print(f"chunk{i} shape={shp}: device exec {best*1e3:.0f} ms")
        total += best
    print(f"pure device total: {total*1e3:.0f} ms")


if __name__ == "__main__":
    main()
