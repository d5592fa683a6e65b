"""Marginal in-loop cost of IOD kernel body pieces (cf. tools/body_cost.py)."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    bench._enable_compile_cache()

    from outfit_tpu.elements.orb_elem import ccek1, eccentricity_control
    from outfit_tpu.iod.gauss import GaussTriplets, gauss_prelim, coeff_eight_poly
    from outfit_tpu.iod.params import IODParams
    from outfit_tpu.iod.roots import aberth_deg8
    from outfit_tpu.iod.scoring import rms_orbit_error
    from outfit_tpu.kepler.universal import SolverConfig, velocity_correction
    from outfit_tpu.elements.types import EquinoctialElements
    from __graft_entry__ import _synthetic_batch

    params = IODParams(n_noise_realizations=3, precision="mixed")
    tri, obs_arrays, lane_traj, window = _synthetic_batch(
        n_traj=2048, lanes_per_traj=8, n_obs=12, seed=7
    )
    L = tri.ra.shape[0]
    K = 3

    f32 = jnp.float32
    tri32 = GaussTriplets(
        tri.ra.astype(f32), tri.dec.astype(f32), tri.time, tri.obs_pos.astype(f32)
    )

    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.uniform(1.0, 3.0, (L, K, 3)), f32)
    x1 = x2 * (1.0 + 1e-3)
    v2 = jnp.asarray(rng.normal(0, 0.01, (L, K, 3)), f32)
    dt = jnp.asarray(rng.uniform(3, 15, (L, K)))
    chi = jnp.zeros((L, K), f32)
    vc_cfg = SolverConfig(convergency=params.kepler_eps, auto_fallback=False)

    def loop_cost(name, body, carry0, trips=(2, 6)):
        @partial(jax.jit, static_argnames=("n",))
        def f(c, n):
            def b(s):
                i, cc = s
                return i + 1, body(cc)

            return jax.lax.while_loop(lambda s: s[0] < n, b,
                                      (jnp.array(0, jnp.int32), c))[1]

        ts = {}
        for n in trips:
            out = f(carry0, n)
            jax.block_until_ready(out)
            best = 1e9
            for _ in range(4):
                t0 = time.perf_counter()
                jax.block_until_ready(f(carry0, n))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        d = trips[1] - trips[0]
        print(f"{name:36s} per-iter {(ts[trips[1]]-ts[trips[0]])/d*1e3:7.2f} ms   "
              f"(t{trips[0]} {ts[trips[0]]*1e3:6.1f} t{trips[1]} {ts[trips[1]]*1e3:6.1f})",
              flush=True)

    # velocity_correction body (one side) at (L, K) f32
    def vc_body(c):
        chi = c
        out = velocity_correction(x1, x2, v2, dt, params.max_perihelion_au,
                                  params.max_ecc, chi_guess=chi, cfg=vc_cfg)
        return out.psi

    loop_cost("velocity_correction (L,K) f32", vc_body, chi)

    # eccentricity_control at (L, K)
    def ecc_body(c):
        acc, e, q, en = eccentricity_control(
            x2 * (1.0 + 1e-9 * c[..., :1]), v2, params.max_perihelion_au, params.max_ecc
        )
        return c + 1e-20 * e[..., None]

    loop_cost("eccentricity_control (L,K)", ecc_body, x2)

    # Aberth at (L,) f32
    tau1, tau3, s_mat, s_inv, a, b, u, nonsing = jax.jit(gauss_prelim)(tri32)
    c0, c3, c6 = jax.jit(coeff_eight_poly)(tri32, s_mat, s_inv, a, b)

    def aberth_body(c):
        r = aberth_deg8(c0 * c[..., 0, 0], c3, c6, params.aberth_max_iter,
                        params.aberth_eps)
        return c * (1.0 + 1e-20 * r.real[..., :1, None].mean(-1, keepdims=True))

    loop_cost("aberth_deg8 (L,) f32", aberth_body, jnp.ones((L, 1, 1), f32))

    # scoring at (L, K, N) f32
    mjd, ra, dec, sra, sdec, helio = obs_arrays
    obs_mjd = mjd[lane_traj][:, None, :]
    obs_ra = ra[lane_traj][:, None, :].astype(f32)
    obs_dec = dec[lane_traj][:, None, :].astype(f32)
    obs_sra = sra[lane_traj][:, None, :].astype(f32)
    obs_sdec = sdec[lane_traj][:, None, :].astype(f32)
    obs_helio = helio[lane_traj][:, None, :, :].astype(f32)
    wmask = window[:, None, :]
    epochs = jnp.broadcast_to(tri.time[:, 1:2], (L, K))

    def score_body(c):
        eq = EquinoctialElements(
            epochs, 2.0 + 1e-9 * c, jnp.full((L, K), 0.1, f32),
            jnp.full((L, K), 0.1, f32), jnp.zeros((L, K), f32),
            jnp.zeros((L, K), f32), jnp.ones((L, K), f32),
        )
        r = rms_orbit_error(eq, obs_mjd, obs_ra, obs_dec, obs_sra, obs_sdec,
                            obs_helio, wmask)
        return c + 1e-20 * r

    loop_cost("rms scoring (L,K,N) f32", score_body, jnp.zeros((L, K), f32))

    # ccek1 at (L, K) f32
    def ccek_body(c):
        kind, el = ccek1(x2 + 1e-9 * c, v2)
        return c + 1e-20 * el[..., 0, None] * 0.0 + c * 1.0 + 1e-20 * el[..., 0][..., None]

    loop_cost("ccek1 (L,K)", ccek_body, x2)


if __name__ == "__main__":
    main()
