"""Compare the IOD kernel's TPU (emulated f64) output against CPU.

Run on a machine with the axon TPU visible: python tools/tpu_accuracy_check.py
Records the achieved cross-backend tolerance for the f64-emulation budget
(docs/DESIGN.md "Numerics").
"""
import sys

sys.path.insert(0, ".")

import jax
import numpy as np

from __graft_entry__ import entry, _enable_compile_cache


def _compare(names, out_a, out_b, label):
    print(f"--- {label}")
    for name, a, b in zip(names, out_a, out_b):
        a = np.asarray(a)
        b = np.asarray(b)
        if a.dtype == bool or np.issubdtype(a.dtype, np.integer):
            agree = float((a == b).mean())
            print(f"{name:12s} agreement: {agree*100:.1f}%")
        else:
            both = np.isfinite(a) & np.isfinite(b)
            d = np.abs(a[both] - b[both])
            rel = d / (1.0 + np.abs(b[both]))
            print(f"{name:12s} max |abs diff| {d.max():.3e}  max rel {rel.max():.3e}  "
                  f"finite match {float((np.isfinite(a)==np.isfinite(b)).mean())*100:.1f}%")


def main():
    import jax.numpy as jnp

    from outfit_tpu.iod.api import _iod_kernel
    from outfit_tpu.iod.params import IODParams
    from __graft_entry__ import _synthetic_batch

    _enable_compile_cache()
    n_traj = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    params = IODParams(n_noise_realizations=3, precision="mixed")
    args = _synthetic_batch(n_traj=n_traj, lanes_per_traj=8, n_obs=12, seed=3)

    def fn(tri, obs_arrays, lane_traj, window_mask):
        return _iod_kernel(tri, obs_arrays, lane_traj, window_mask, params)

    jfn = jax.jit(fn)
    out_tpu = jax.block_until_ready(jfn(*args))
    with jax.default_device(jax.devices("cpu")[0]):
        out_cpu = jax.block_until_ready(jax.jit(fn)(*args))

    iod_names = ["best_rms", "kind", "elements", "equinoctial", "epoch", "corrected"]
    _compare(iod_names, out_tpu, out_cpu, "IOD kernel (TPU vs CPU)")

    # --- LSQ stage: refine the CPU IOD seeds on both backends --------------
    from outfit_tpu.lsq.config import DifferentialCorrectionConfig
    from outfit_tpu.lsq.iteration import ObsArrays
    from outfit_tpu.lsq.loop import run_differential_correction

    tri, obs_arrays, lane_traj, window = args
    seed_eq = np.asarray(out_cpu[3])
    seed_ep = np.asarray(out_cpu[4])
    ok = np.isfinite(np.asarray(out_cpu[0])) & np.isfinite(seed_eq).all(axis=1)
    seed_eq = np.where(ok[:, None], seed_eq, np.array([2.0, 0, 0, 0, 0, 1.0]))
    seed_ep = np.where(ok, seed_ep, 57000.0)
    mjd, ra, dec, sra, sdec, helio = obs_arrays
    T, N = np.asarray(mjd).shape
    obs = ObsArrays(
        mjd, ra, dec, sra, sdec,
        jnp.broadcast_to(jnp.asarray(helio), (T, N, 3)),
        jnp.ones((T, N), bool),
    )
    cfg = DifferentialCorrectionConfig(
        divergence_grace_iterations=2, precision="mixed"
    )
    lsq = jax.jit(lambda e, t, o: run_differential_correction(e, t, o, cfg))
    el = jnp.asarray(seed_eq)
    ep = jnp.asarray(seed_ep)
    r_tpu = jax.block_until_ready(lsq(el, ep, obs))
    with jax.default_device(jax.devices("cpu")[0]):
        r_cpu = jax.block_until_ready(jax.jit(
            lambda e, t, o: run_differential_correction(e, t, o, cfg)
        )(el, ep, obs))
    lsq_names = ["elements", "status", "normalised_rms", "covariance"]
    _compare(
        lsq_names,
        [r_tpu.elements, r_tpu.status, r_tpu.normalised_rms, r_tpu.covariance],
        [r_cpu.elements, r_cpu.status, r_cpu.normalised_rms, r_cpu.covariance],
        "LSQ kernel (TPU vs CPU, same seeds)",
    )
    # restrict element comparison to trajectories converged on BOTH backends
    # (marginal lanes can flip status across backends — that is seed-grade
    # spread; element agreement is only meaningful on the common converged set)
    both = (np.asarray(r_tpu.status) == 1) & (np.asarray(r_cpu.status) == 1)
    a = np.asarray(r_tpu.elements)[both]
    b = np.asarray(r_cpu.elements)[both]
    rel = np.abs(a - b) / (1.0 + np.abs(b))
    print(f"both-converged: {both.mean()*100:.1f}% of {len(both)}; "
          f"elements max rel {rel.max():.3e}  median {np.median(rel):.3e}")


if __name__ == "__main__":
    main()
