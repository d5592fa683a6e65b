"""Direct per-kernel device-wall decomposition of a fit_lsq pipeline.

Intercepts the dispatch's jitted entry points (_enum_chunk_jit,
_iod_kernel_dense_jit, the LSQ runner) during a real fit, then re-times
each captured call on its production arguments — the instrument that
established the round-4 lean real-cadence floor (docs/DESIGN.md: enum 65
+ dense IOD ~195 + LSQ ~210 ms per 4096 trajectories, every iteration
cap slack).  Full-pipeline A/Bs on the tunnel are noise-limited at
+-1.5k fits/s; this isolates each kernel at +-5 ms.

Usage:
    python tools/device_decomp.py [--n-traj 4096] [--workload real|ragged]
        [--set newton_max_it=10] [--cfg prewarm_max_iterations=12]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from outfit_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def _parse_overrides(pairs):
    out = {}
    for kv in pairs or []:
        k, _, v = kv.partition("=")
        out[k] = float(v) if "." in v or "e" in v.lower() else int(v)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-traj", type=int, default=4096)
    ap.add_argument("--workload", choices=("real", "ragged"), default="real")
    ap.add_argument("--set", action="append", dest="p_over",
                    help="IODParams override, e.g. --set newton_max_it=10")
    ap.add_argument("--cfg", action="append", dest="c_over",
                    help="DifferentialCorrectionConfig override")
    args = ap.parse_args()

    import jax

    import bench
    import outfit_tpu.iod.api as A
    import outfit_tpu.lsq.api as L
    from outfit_tpu.iod.params import IODParams
    from outfit_tpu.lsq.config import DifferentialCorrectionConfig

    print("devices:", jax.devices(), flush=True)
    eph = bench.bench_eph()
    if args.workload == "real":
        ds = bench.real_cadence_dataset(args.n_traj, seed=301)
        p_base = dict(n_noise_realizations=0, precision="mixed",
                      newton_max_it=20, max_triplets=4,
                      max_obs_for_triplets=32)
    else:
        ds = bench.synthetic_dataset_ragged(args.n_traj, eph, seed=301)
        p_base = dict(n_noise_realizations=3, precision="mixed",
                      newton_max_it=20, max_triplets=2)
    c_base = dict(divergence_grace_iterations=2, precision="mixed",
                  max_newton_iterations=4, prewarm_max_iterations=16)
    p = IODParams(**{**p_base, **_parse_overrides(args.p_over)})
    c = DifferentialCorrectionConfig(**{**c_base, **_parse_overrides(args.c_over)})

    cap_dense, cap_enum, cap_lsq = [], [], []
    od, oe, og = A._iod_kernel_dense_jit, A._enum_chunk_jit, L._get_runner

    def wd(*a, **k):
        cap_dense.append((a, k))
        return od(*a, **k)

    def we(*a, **k):
        cap_enum.append((a, k))
        return oe(*a, **k)

    def wg(*a, **k):
        runner = og(*a, **k)

        def wrapped(*ra, **rk):
            cap_lsq.append((runner, ra, rk))
            return runner(*ra, **rk)

        return wrapped

    A._iod_kernel_dense_jit, A._enum_chunk_jit, L._get_runner = wd, we, wg
    try:
        t0 = time.time()
        res = L.fit_lsq(ds, eph, p, c, seed=7)
        t_full = time.time() - t0
    finally:
        A._iod_kernel_dense_jit, A._enum_chunk_jit, L._get_runner = od, oe, og
    conv = sum(1 for r in res.values() if r.ok and not r.fell_back_to_iod)
    print(f"full call {t_full:.1f}s; conv {conv}/{len(res)} "
          f"({conv/len(res)*100:.2f}%)", flush=True)
    print(f"captured: enum {len(cap_enum)}, dense {len(cap_dense)}, "
          f"lsq {len(cap_lsq)}", flush=True)

    def timeit(label, fn, *a, **k):
        jax.block_until_ready(fn(*a, **k))
        best = np.inf
        for _ in range(5):
            t0 = time.time()
            jax.block_until_ready(fn(*a, **k))
            best = min(best, time.time() - t0)
        print(f"  {label}: {best*1e3:.0f} ms", flush=True)
        return best

    tot = 0.0
    for i, (a, k) in enumerate(cap_enum):
        tot += timeit(f"enum  chunk{i} {tuple(a[1].shape)}", oe, *a, **k)
    for i, (a, k) in enumerate(cap_dense):
        tot += timeit(
            f"dense chunk{i} Tb={a[1].shape[0]} nmax={a[1].shape[1]}",
            od, *a, **k,
        )
    for i, (runner, ra, rk) in enumerate(cap_lsq):
        tot += timeit(f"lsq   chunk{i}", runner, *ra, **rk)
    print(f"TOTAL device wall: {tot*1e3:.0f} ms "
          f"({tot/len(res)*1e6:.0f} us/trajectory)", flush=True)


if __name__ == "__main__":
    main()
