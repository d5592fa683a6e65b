"""A/B: per-orbit vs one-dispatch bulk ephemeris generation on the chip.

compute_ephemerides_for_results (reference batch.rs:73 parity) issues one
compute_apparent dispatch PER ORBIT; compute_ephemerides_batch evaluates
the whole catalog in one (n_orbits, n_pairs) call.  This measures the
real service-side difference through the tunnel, warm, same process.

Usage: python tools/ephem_batch_ab.py [n_orbits] [n_epochs]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from outfit_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def main():
    n_orbits = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax

    import bench
    from outfit_tpu.ephemeris import (
        EphemerisMode,
        EphemerisRequest,
        compute_ephemerides_batch,
        compute_ephemerides_for_results,
    )
    from outfit_tpu.lsq.api import LsqResult
    from outfit_tpu.observations.observatories import Observer

    print("devices:", jax.devices(), flush=True)
    eph = bench.bench_eph()
    rng = np.random.default_rng(9)
    results = {}
    for k in range(n_orbits):
        ecc = rng.uniform(0, 0.3)
        pom = rng.uniform(0, 2 * np.pi)
        results[f"T{k:05d}"] = LsqResult(
            f"T{k:05d}", ok=True, epoch=57000.0, status=1,
            normalised_rms=1.0,
            equinoctial=np.array([
                rng.uniform(1.3, 3.2), ecc * np.sin(pom), ecc * np.cos(pom),
                0.01, 0.02, rng.uniform(0, 2 * np.pi),
            ]),
        )
    req = EphemerisRequest().add(
        Observer.geocenter(),
        EphemerisMode.range(57010.0, 57010.0 + n_epochs - 1, 1.0),
    )
    n_entries = n_orbits * len(req)

    # warm both paths (compile + first transfer)
    t0 = time.time()
    compute_ephemerides_batch(results, req, eph)
    print(f"batch compile+first: {time.time()-t0:.1f}s", flush=True)
    sub = dict(list(results.items())[:2])
    compute_ephemerides_for_results(sub, req, eph)

    t0 = time.time()
    table = compute_ephemerides_batch(results, req, eph)
    t_batch = time.time() - t0
    print(
        f"BATCH (1 dispatch):      {t_batch*1e3:8.0f} ms for {n_entries} "
        f"entries ({n_entries/t_batch:,.0f} entries/sec)", flush=True,
    )

    # the per-orbit path pays its host prep + dispatch PER ORBIT, so a
    # 32-orbit subset gives the per-orbit rate without a multi-minute run
    n_sub = min(n_orbits, 32)
    sub = dict(list(results.items())[:n_sub])
    t0 = time.time()
    per = compute_ephemerides_for_results(sub, req, eph)
    t_per = time.time() - t0
    rate_per = n_sub * len(req) / t_per
    t_per_full = n_orbits * (t_per / n_sub)
    print(
        f"PER-ORBIT ({n_sub} orbits measured): {t_per*1e3:8.0f} ms "
        f"({rate_per:,.0f} entries/sec; {t_per/n_sub*1e3:.0f} ms/orbit) "
        f"-> full {n_orbits}-orbit catalog ~{t_per_full:,.1f}s vs batch "
        f"{t_batch:,.2f}s = {t_per_full/t_batch:,.0f}x", flush=True,
    )

    # spot parity
    tid = "T00000"
    a = list(per[tid])[3].value.position.ra
    b = list(table.result(tid))[3].value.position.ra
    print(f"parity spot check dra = {abs(a-b):.2e}", flush=True)


if __name__ == "__main__":
    main()
