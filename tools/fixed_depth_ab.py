"""A/B: batch-max while-loop LSQ corrector vs FIXED-depth fori variant.

VERDICT r4 next-round #2 (the real-cadence endgame): the round-4 floor
analysis attributes the LSQ share (~210 ms of the 475 ms device wall per
4096-trajectory lean real-cadence dataset) to serial trip depth in the
masked batch-converged while loops, and names "a different corrector
architecture" as the one uncosted escape hatch.  This tool measures it:

* BASELINE — production ``run_differential_correction`` (f32 prewarm
  while + while-outer(outlier) x while-inner(Newton), each exiting when
  every lane is done = batch-MAX trip depth, plus a ``jnp.any`` condition
  reduce per trip);
* FIXED(P, D, R) — the same masked bodies under counted ``fori_loop``s:
  prewarm exactly P trips, R outlier passes PYTHON-UNROLLED, Newton
  exactly D trips per pass, no convergence conditions anywhere.  Lanes
  that needed more depth simply end unconverged and would be swept into
  the existing batched escalation refit (fit_lsq_stream_escalating).

Both run on the SAME captured production arguments (the device_decomp
interception pattern): a real fit_lsq over the tiled real-MPC workload is
run once, the merged LSQ runner's concrete inputs are captured, and
(el, ep, obs) are reconstructed exactly as the runner builds them.

Outputs one row per variant: device wall (best of N), converged fraction,
and element agreement vs baseline on lanes both converge, so the
throughput/convergence trade (and the refit sweep size) is explicit.

Usage: python tools/fixed_depth_ab.py [--n-traj 4096] [--reps 5]
"""

import argparse
import os
import sys
import time
from typing import NamedTuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from outfit_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def _capture_lsq_args(n_traj):
    """Run the lean real-cadence fit once, capturing the merged LSQ
    runner's concrete args + cfg; returns (el, ep, obs, cfg, ephem)."""
    import jax.numpy as jnp

    import bench
    import outfit_tpu.lsq.api as L
    from outfit_tpu.iod.params import IODParams
    from outfit_tpu.lsq.config import DifferentialCorrectionConfig
    from outfit_tpu.lsq.iteration import ObsArrays

    eph = bench.bench_eph()
    ds = bench.real_cadence_dataset(n_traj, seed=301)
    p = IODParams(n_noise_realizations=0, precision="mixed",
                  newton_max_it=20, max_triplets=4, max_obs_for_triplets=32)
    c = DifferentialCorrectionConfig(
        divergence_grace_iterations=2, precision="mixed",
        max_newton_iterations=4, prewarm_max_iterations=16,
    )

    captured = []
    orig_get = L._get_runner

    def spy_get(cfg, ephem, with_bias, seeded=False):
        runner = orig_get(cfg, ephem, with_bias, seeded)

        def wrapped(*ra, **rk):
            captured.append((cfg, seeded, ra, rk))
            return runner(*ra, **rk)

        return wrapped

    L._get_runner = spy_get
    try:
        res = L.fit_lsq(ds, eph, p, c, seed=7)
    finally:
        L._get_runner = orig_get
    conv = sum(1 for r in res.values() if r.ok and not r.fell_back_to_iod)
    print(f"capture fit: conv {conv}/{len(res)} "
          f"({conv/len(res)*100:.2f}%), {len(captured)} LSQ call(s)",
          flush=True)
    assert captured, "no LSQ runner calls captured"
    cfg, seeded, ra, rk = captured[0]

    if seeded == "merged":
        seeds, sel_rows, base, glob_idx, valid = ra
        merged = [
            jnp.concatenate([s[i] for s in seeds])[sel_rows]
            for i in (0, 3, 4)
        ]
        iod_rms, iod_eqv, iod_epoch = merged
    else:
        iod_rms, iod_eqv, iod_epoch, base, glob_idx, valid = ra

    ok = jnp.isfinite(iod_rms) & jnp.isfinite(iod_eqv).all(-1)
    benign = jnp.asarray([2.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    el = jnp.where(ok[:, None], jnp.where(jnp.isfinite(iod_eqv), iod_eqv, 0.0), benign)
    ep = jnp.where(ok, jnp.where(jnp.isfinite(iod_epoch), iod_epoch, 57000.0), 57000.0)
    mjd_b, ra_b, dec_b, sra_b, sdec_b, helio_b, bra_b, bdec_b = base
    obs = ObsArrays(
        jnp.where(valid, mjd_b[glob_idx], 0.0),
        jnp.where(valid, ra_b[glob_idx], 0.0),
        jnp.where(valid, dec_b[glob_idx], 0.0),
        jnp.where(valid, sra_b[glob_idx], 1.0),
        jnp.where(valid, sdec_b[glob_idx], 1.0),
        jnp.where(valid[..., None], helio_b[glob_idx], 0.0),
        valid,
        bias_ra=None if bra_b is None else jnp.where(valid, bra_b[glob_idx], 0.0),
        bias_dec=None if bdec_b is None else jnp.where(valid, bdec_b[glob_idx], 0.0),
    )
    print(f"captured LSQ shape: T={obs.mjd.shape[0]} N={obs.mjd.shape[1]} "
          f"(seeded={seeded!r})", flush=True)
    return el, ep, obs, cfg, eph


def run_fixed(elements0, epoch, obs, cfg, ephem, P, D, R):
    """Fixed-depth corrector: P prewarm trips, R Python-unrolled outlier
    passes of exactly D Newton trips, no batch-convergence conditions.
    Same masked per-lane bodies/contracts as loop.py (cited inline);
    lanes needing more depth end unconverged (status RUNNING -> their
    last advanced state is still reported, conv flag down)."""
    import jax
    import jax.numpy as jnp

    from outfit_tpu.lsq.iteration import (
        SEL_ACTIVE, SEL_FORCED_OUT, SEL_REJECTED, ObsArrays, single_iteration,
    )
    from outfit_tpu.lsq.loop import (
        STATUS_BIZARRE, STATUS_DIVERGED, STATUS_INVERSION_FAILED, STATUS_OK,
        STATUS_RUNNING, _BIG, _elements_bizarre,
    )

    T, N = obs.mjd.shape
    selection0 = jnp.where(obs.valid, SEL_ACTIVE, SEL_FORCED_OUT).astype(jnp.int32)
    free = jnp.broadcast_to(jnp.asarray(cfg.free_elements, bool), (6,))

    # ---- prewarm: fori at exactly P trips (loop.py::_prewarm_f32 body) ----
    obs32 = ObsArrays(
        obs.mjd,
        obs.ra.astype(jnp.float32), obs.dec.astype(jnp.float32),
        obs.sigma_ra.astype(jnp.float32), obs.sigma_dec.astype(jnp.float32),
        obs.helio_pos.astype(jnp.float32), obs.valid,
        bias_ra=None if obs.bias_ra is None else obs.bias_ra.astype(jnp.float32),
        bias_dec=None if obs.bias_dec is None else obs.bias_dec.astype(jnp.float32),
    )
    thr32 = max(cfg.convergence_threshold, 1e-3)

    def pre_body(it, carry):
        el, prev_norm, done, kep = carry
        res = single_iteration(
            el, epoch, selection0, obs32, free, cfg.propagator, ephem,
            kepler_warm=(kep[..., 0], kep[..., 1], kep[..., 2]),
        )
        sane = (
            res.inversion_ok
            & jnp.isfinite(res.correction_norm)
            & ~_elements_bizarre(res.corrected, cfg.orbital_limits)
        )
        adv = ~done & sane
        el = jnp.where(adv[:, None], res.corrected, el)
        plateau = (it >= 2) & (res.correction_norm >= 0.5 * prev_norm)
        done = done | ~sane | (adv & ((res.correction_norm < thr32) | plateau))
        return (el, jnp.where(adv, res.correction_norm, prev_norm), done,
                res.kepler)

    el32, _, _, _ = jax.lax.fori_loop(
        0, P, pre_body,
        (
            jnp.asarray(elements0, jnp.float32),
            jnp.full(T, jnp.float32(jnp.finfo(jnp.float32).max)),
            jnp.zeros(T, bool),
            jnp.full(obs.mjd.shape + (3,), jnp.nan, jnp.float32),
        ),
    )
    bad = ~jnp.isfinite(el32).all(axis=-1)
    el64 = jnp.where(
        bad[:, None], jnp.asarray(elements0, jnp.float64),
        el32.astype(jnp.float64),
    )

    class St(NamedTuple):
        elements: jnp.ndarray
        selection: jnp.ndarray
        status: jnp.ndarray
        last_rms: jnp.ndarray
        last_cov: jnp.ndarray
        last_normal: jnp.ndarray
        last_m: jnp.ndarray
        last_res_ra: jnp.ndarray
        last_res_dec: jnp.ndarray
        last_dra: jnp.ndarray
        last_ddec: jnp.ndarray
        outer_done: jnp.ndarray
        converged: jnp.ndarray
        kepler: jnp.ndarray

    st = St(
        elements=el64,
        selection=selection0,
        status=jnp.zeros(T, jnp.int32),
        last_rms=jnp.full(T, _BIG),
        last_cov=jnp.zeros((T, 6, 6)),
        last_normal=jnp.zeros((T, 6, 6)),
        last_m=jnp.zeros(T, jnp.int32),
        last_res_ra=jnp.zeros((T, N)),
        last_res_dec=jnp.zeros((T, N)),
        last_dra=jnp.zeros((T, N, 6)),
        last_ddec=jnp.zeros((T, N, 6)),
        outer_done=jnp.zeros(T, bool),
        converged=jnp.zeros(T, bool),
        kepler=jnp.full((T, N, 3), jnp.nan),
    )

    jac_dtype = jnp.float32  # mixed mode (cfg.precision == "mixed")

    def inner_fixed(st):
        """Exactly D Newton trips (loop.py::inner_loop body, same status
        order diff_cor.rs:282-430)."""

        def body(it, carry):
            st, prev_rms, stagn, inner_done, converged = carry
            act = (
                ~inner_done & (st.status == STATUS_RUNNING) & ~st.outer_done
            )
            res = single_iteration(
                st.elements, epoch, st.selection, obs, free, cfg.propagator,
                ephem, jac_dtype,
                kepler_warm=(
                    st.kepler[..., 0], st.kepler[..., 1], st.kepler[..., 2]
                ),
            )
            inv_fail = act & ~res.inversion_ok
            bizarre = act & ~inv_fail & _elements_bizarre(
                res.corrected, cfg.orbital_limits
            )
            had_prev = prev_rms < _BIG
            diverged = (
                act & ~inv_fail & ~bizarre & had_prev
                & (it >= cfg.divergence_grace_iterations)
                & (res.normalised_rms / prev_rms >= cfg.rms_divergence_ratio)
            )
            stagnated = (
                act & ~inv_fail & ~bizarre & ~diverged & had_prev
                & (res.normalised_rms / prev_rms >= cfg.rms_stagnation_ratio)
            )
            stagn = jnp.where(stagnated, stagn + 1, 0)
            stagn_break = stagnated & (stagn >= cfg.max_stagnation_iterations)
            advance = act & ~inv_fail & ~bizarre & ~diverged & ~stagn_break
            conv = advance & (res.correction_norm < cfg.convergence_threshold)
            status = jnp.where(
                inv_fail, STATUS_INVERSION_FAILED,
                jnp.where(bizarre, STATUS_BIZARRE,
                          jnp.where(diverged, STATUS_DIVERGED, st.status)),
            ).astype(jnp.int32)
            a1 = advance[:, None]
            a2 = advance[:, None, None]
            st = st._replace(
                elements=jnp.where(a1, res.corrected, st.elements),
                status=status,
                last_rms=jnp.where(advance, res.normalised_rms, st.last_rms),
                last_cov=jnp.where(a2, res.covariance, st.last_cov),
                last_normal=jnp.where(a2, res.normal_matrix, st.last_normal),
                last_m=jnp.where(advance, res.num_measurements, st.last_m),
                last_res_ra=jnp.where(a1, res.residual_ra, st.last_res_ra),
                last_res_dec=jnp.where(a1, res.residual_dec, st.last_res_dec),
                last_dra=jnp.where(a2, res.d_ra, st.last_dra),
                last_ddec=jnp.where(a2, res.d_dec, st.last_ddec),
                kepler=jnp.where(act[:, None, None], res.kepler, st.kepler),
            )
            done = inner_done | inv_fail | bizarre | diverged | stagn_break | conv
            return (st, jnp.where(advance, res.normalised_rms, prev_rms),
                    stagn, done, converged | conv)

        running0 = (st.status == STATUS_RUNNING) & ~st.outer_done
        out = jax.lax.fori_loop(
            0, D, body,
            (st, jnp.full(T, _BIG), jnp.zeros(T, jnp.int32), ~running0,
             jnp.zeros(T, bool)),
        )
        return out[0], out[4]

    def outlier_step(st):
        # identical to loop.py::outlier_step (outlier_rejection.rs:118-227)
        cov = st.last_cov
        var_ra = obs.sigma_ra**2
        var_dec = obs.sigma_dec**2
        gca = jnp.sum(cov[:, None] * st.last_dra[..., None, :], -1)
        gcd = jnp.sum(cov[:, None] * st.last_ddec[..., None, :], -1)
        was_active = st.selection == SEL_ACTIVE
        wa = was_active.astype(jnp.float64)
        paa = jnp.sum(st.last_dra * gca, axis=-1) * wa
        pdd = jnp.sum(st.last_ddec * gcd, axis=-1) * wa
        pad = jnp.sum(st.last_dra * gcd, axis=-1) * wa
        v00 = var_ra - paa
        v11 = var_dec - pdd
        v01 = -pad
        det = v00 * v11 - v01 * v01
        scale = jnp.maximum(jnp.abs(v00), jnp.abs(v11))
        singular = (
            jnp.abs(det) < jnp.finfo(jnp.float64).eps * scale**2
        ) | (scale == 0.0)
        det_safe = jnp.where(singular, 1.0, det)
        xr, xd = st.last_res_ra, st.last_res_dec
        chi2 = (v11 * xr * xr - 2.0 * v01 * xr * xd + v00 * xd * xd) / det_safe
        sel = st.selection
        reject = (
            (sel == SEL_ACTIVE) & ~singular
            & (chi2 > cfg.outlier_rejection.chi_squared_rejection_threshold)
        )
        recover = (
            (sel == SEL_REJECTED) & ~singular
            & (chi2 <= cfg.outlier_rejection.chi_squared_recovery_threshold)
        )
        new_sel = jnp.where(
            reject, SEL_REJECTED, jnp.where(recover, SEL_ACTIVE, sel)
        ).astype(jnp.int32)
        changes = jnp.sum((reject | recover) & obs.valid, axis=-1)
        return new_sel, changes

    for outer_pass in range(R):
        entered = (st.status == STATUS_RUNNING) & ~st.outer_done
        st, inner_conv = inner_fixed(st)
        # a lane's convergence flag reflects its LAST entered pass only
        st = st._replace(
            converged=jnp.where(entered, inner_conv, st.converged)
        )
        running = st.status == STATUS_RUNNING
        clean = (
            (outer_pass == 0)
            & (st.last_rms < cfg.convergence_before_rejection_threshold)
        )
        done_now = running & ~st.outer_done & (clean | ~inner_conv)
        need = running & ~st.outer_done & ~done_now
        new_sel, changes = outlier_step(st)
        sel = jnp.where(need[:, None], new_sel, st.selection)
        stable = need & (changes == 0)
        st = st._replace(
            selection=sel, outer_done=st.outer_done | done_now | stable
        )

    # final full-f64 linearization refresh (loop.py lines 409-430)
    res = single_iteration(
        st.elements, epoch, st.selection, obs, free, cfg.propagator, ephem,
        kepler_warm=(st.kepler[..., 0], st.kepler[..., 1], st.kepler[..., 2]),
    )
    keep = (st.status == STATUS_RUNNING) & res.inversion_ok
    k1 = keep[:, None]
    k2 = keep[:, None, None]
    st = st._replace(
        last_rms=jnp.where(keep, res.normalised_rms, st.last_rms),
        last_cov=jnp.where(k2, res.covariance, st.last_cov),
        last_normal=jnp.where(k2, res.normal_matrix, st.last_normal),
        last_m=jnp.where(keep, res.num_measurements, st.last_m),
    )
    # SAME terminal semantics as the baseline (loop.py:432-435): every
    # still-RUNNING lane is OK — quality parity is judged on nRMS/elements
    # by the caller; st.converged rides along as the strict diagnostic
    status = jnp.where(
        st.status == STATUS_RUNNING, STATUS_OK, st.status
    ).astype(jnp.int32)

    n_free = int(sum(cfg.free_elements))
    m = st.last_m
    factor = jnp.sqrt(m / jnp.maximum(m - n_free, 1))
    mu = jnp.where(
        n_free < m,
        jnp.where(st.last_rms > 1.0, st.last_rms * factor, factor), 1.0,
    )
    mu2 = (mu * mu)[:, None, None]
    return (
        st.elements, status,
        jnp.where(st.last_rms < _BIG, st.last_rms, jnp.inf),
        st.last_cov * mu2, st.converged,
    )


def main():
    import dataclasses

    ap = argparse.ArgumentParser()
    ap.add_argument("--n-traj", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--depths", default="16,4,3 12,3,2 10,3,2",
                    help="space-separated P,D,R fori combos")
    ap.add_argument("--passes", default="2,3",
                    help="comma list of while-outer caps to include")
    args = ap.parse_args()

    import jax

    print("devices:", jax.devices(), flush=True)
    el, ep, obs, cfg, eph = _capture_lsq_args(args.n_traj)
    from outfit_tpu.lsq.loop import run_differential_correction

    # ---- build every variant, compile up front --------------------------
    variants = []  # (label, fn, kind)
    variants.append((
        "WHILE passes=10 (baseline)",
        jax.jit(lambda e, t, o: run_differential_correction(
            e, t, o, cfg, ephem=eph)),
        "while",
    ))
    for p in (int(x) for x in args.passes.split(",") if x):
        cfg_p = dataclasses.replace(cfg, max_outlier_rejection_passes=p)
        variants.append((
            f"WHILE passes={p}",
            jax.jit(lambda e, t, o, c=cfg_p: run_differential_correction(
                e, t, o, c, ephem=eph)),
            "while",
        ))
    for combo in args.depths.split():
        P, D, R = (int(x) for x in combo.split(","))
        variants.append((
            f"FORI  P={P:2d} D={D} R={R}",
            jax.jit(lambda e, t, o, P=P, D=D, R=R: run_fixed(
                e, t, o, cfg, eph, P, D, R)),
            "fori",
        ))

    outs = []
    for label, fn, kind in variants:
        t0 = time.time()
        out = fn(el, ep, obs)
        jax.block_until_ready(out)
        outs.append(out)
        print(f"compiled {label} ({time.time()-t0:.0f}s)", flush=True)

    # ---- INTERLEAVED timing: tunnel throughput drifts across minutes, so
    # cross-variant comparisons must alternate within one process
    # (rep-medians; the operational lesson from rounds 3-4)
    times = [[] for _ in variants]
    for rep in range(args.reps):
        for i, (label, fn, kind) in enumerate(variants):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(el, ep, obs))
            times[i].append(time.perf_counter() - t0)

    base_out = outs[0]
    st_b = np.asarray(base_out.status)
    el_b = np.asarray(base_out.elements)
    nr_b = np.asarray(base_out.normalised_rms)
    from outfit_tpu.lsq.api import uncertainties_from_covariance

    sig_b = np.asarray(uncertainties_from_covariance(base_out.covariance))
    real = st_b == 1  # pad/benign rows never reach OK in the baseline
    t_base = float(np.median(times[0]))
    print(f"\n{len(st_b)} rows, {real.sum()} real; baseline median "
          f"{t_base*1e3:.1f} ms over {args.reps} interleaved reps",
          flush=True)

    for i, (label, fn, kind) in enumerate(variants):
        out = outs[i]
        if kind == "while":
            el_f = np.asarray(out.elements)
            st_f = np.asarray(out.status)
            nr_f = np.asarray(out.normalised_rms)
        else:
            el_f = np.asarray(out[0])
            st_f = np.asarray(out[1])
            nr_f = np.asarray(out[2])
        t = float(np.median(times[i]))
        ok_f = real & (st_f == 1)
        # same-basin vs baseline: every element within 0.5 of the
        # baseline fit's own 1-sigma (the certificate's basin metric) —
        # rows outside it mostly reflect a different outlier selection
        with np.errstate(invalid="ignore", divide="ignore"):
            basin = ok_f & (
                (np.abs(el_f - el_b) / np.maximum(sig_b, 1e-300)).max(axis=1)
                < 0.5
            )
        off = real & ~basin
        dn_off = (nr_f - nr_b)[off]
        worse = off & ((nr_f - nr_b) > 1e-2)
        print(
            f"{label}: {t*1e3:7.1f} ms ({t/t_base*100:3.0f}%)  "
            f"OK {ok_f.sum()}/{real.sum()}  "
            f"same-basin {basin.sum()/max(real.sum(),1)*100:5.1f}%  "
            f"off-basin {off.sum()} (dnRMS p50 "
            f"{np.median(dn_off) if off.any() else 0:+.1e}, "
            f"worse>1e-2 {worse.sum()})",
            flush=True,
        )


if __name__ == "__main__":
    main()
