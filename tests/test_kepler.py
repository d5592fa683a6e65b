"""Universal-variable Kepler kernel oracles.

Oracles come from the reference's inline tests (``src/kepler/stumpff.rs``,
``src/kepler/propagation.rs``, ``src/orb_elem.rs``) plus an independent
scipy-DOP853 two-body integration, mirroring the reference's own
ground-truth methodology (``propagation.rs:245-249``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from outfit_tpu.constants import GAUSS_GRAV_SQUARED
from outfit_tpu.kepler import (
    KeplerParams,
    SolverConfig,
    propagate_universal,
    s_funct,
    solve_kepuni,
    velocity_correction,
)
from outfit_tpu.elements import ccek1, eccentricity_control
from outfit_tpu.elements.orb_elem import KIND_KEPLERIAN


def _np(x):
    return np.asarray(x)


class TestStumpff:
    def test_real_data_oracle(self):
        # src/kepler/stumpff.rs:404-414
        s0, s1, s2, s3 = s_funct(-15.279808141051223, -1.6298946008705195e-4)
        assert float(s0) == pytest.approx(0.9810334785583247, abs=1e-13)
        assert float(s1) == pytest.approx(-15.183083836892674, abs=1e-12)
        assert float(s2) == pytest.approx(116.3665517484714, abs=1e-10)
        assert float(s3) == pytest.approx(-593.4390119881925, abs=1e-9)

    def test_zero_psi(self):
        s0, s1, s2, s3 = s_funct(0.0, 2.0)
        assert float(s0) == 1.0 and float(s1) == 0.0
        assert float(s2) == 0.0 and float(s3) == 0.0

    def test_zero_alpha(self):
        psi = 2.0
        s0, s1, s2, s3 = s_funct(psi, 0.0)
        assert float(s0) == pytest.approx(1.0, abs=1e-14)
        assert float(s1) == pytest.approx(psi, abs=1e-14)
        assert float(s2) == pytest.approx(psi**2 / 2, abs=1e-14)
        assert float(s3) == pytest.approx(psi**3 / 6, abs=1e-14)

    @pytest.mark.parametrize("psi,alpha", [(0.01, 0.1), (2.5, 1.0), (10.0, 5.0), (1.0, 0.5)])
    def test_invariants(self, psi, alpha):
        s0, s1, s2, s3 = map(float, s_funct(psi, alpha))
        assert s0 == pytest.approx(1.0 + alpha * s2, rel=1e-12)
        assert s1 == pytest.approx(psi + alpha * s3, rel=1e-12)

    def test_symmetry(self):
        s0p, s1p, s2p, s3p = map(float, s_funct(1.0, 0.5))
        s0n, s1n, s2n, s3n = map(float, s_funct(-1.0, 0.5))
        assert s0p == pytest.approx(s0n, abs=1e-12)
        assert s2p == pytest.approx(s2n, abs=1e-12)
        assert s1p == pytest.approx(-s1n, abs=1e-12)
        assert s3p == pytest.approx(-s3n, abs=1e-12)

    def test_against_trig_closed_form(self):
        # For alpha < 0: s0 = cos(psi*sqrt(-alpha)), s1 = sin(...)/sqrt(-alpha)
        rng = np.random.default_rng(0)
        psi = rng.uniform(-50, 50, 256)
        alpha = -(10.0 ** rng.uniform(-5, 1, 256))
        s0, s1, _, _ = s_funct(psi, alpha)
        w = np.sqrt(-alpha)
        np.testing.assert_allclose(_np(s0), np.cos(psi * w), atol=5e-12)
        np.testing.assert_allclose(_np(s1), np.sin(psi * w) / w, atol=5e-12, rtol=5e-12)
        # hyperbolic: s0 = cosh(psi*sqrt(alpha))
        alpha_h = 10.0 ** rng.uniform(-5, -1, 256)
        psi_h = rng.uniform(-20, 20, 256)
        s0h, s1h, _, _ = s_funct(psi_h, alpha_h)
        wh = np.sqrt(alpha_h)
        np.testing.assert_allclose(_np(s0h), np.cosh(psi_h * wh), rtol=1e-12)
        np.testing.assert_allclose(_np(s1h), np.sinh(psi_h * wh) / wh, rtol=1e-12)

    def test_batched_shape(self):
        s = s_funct(jnp.ones((4, 7)), -0.5 * jnp.ones((4, 7)))
        assert all(x.shape == (4, 7) for x in s)


#: (position, velocity, t0, t1, expected_r1, expected_v1) from
#: src/kepler/propagation.rs tests (scipy DOP853 + mpmath ground truth).
_PROPAG_FIXTURES = [
    (
        [-8.264959160036185e-1, 3.9196606084860963e-1, 2.2299196071828425e-2],
        [-5.4473671119342e-3, -2.107596146728544e-2, 1.5608111521258896e-3],
        6.072555422778894e4,
        6.0727546704688815e4,
        [-0.83670766718652, 0.34968043043198, 0.02539102537652],
        [-0.00479883489139, -0.02136507308119, 0.00154221064858],
    ),
    (
        [-8.209687552250132e-1, 3.782813412927746e-1, 2.5673305402857578e-2],
        [-5.290803826727631e-3, -2.1207542445249382e-2, 1.601930231829977e-3],
        6.072555414035025e4,
        6.0727546617250126e4,
        [-0.8308499934162212, 0.33573406780460846, 0.028843689480680244],
        [-0.004623556668660562, -0.021495885832796668, 0.0015799033389438464],
    ),
]


class TestPropagation:
    @pytest.mark.parametrize("fix", _PROPAG_FIXTURES)
    def test_reference_fixtures(self, fix):
        pos, vel, t0, t1, er1, ev1 = fix
        res = propagate_universal(jnp.array(pos), jnp.array(vel), t0, t1)
        assert int(res.status) == 0
        assert np.linalg.norm(_np(res.r1) - er1) < 1e-9
        assert np.linalg.norm(_np(res.v1) - ev1) < 1e-9

    def test_lagrange_identity(self):
        pos, vel, t0, t1, _, _ = _PROPAG_FIXTURES[0]
        res = propagate_universal(jnp.array(pos), jnp.array(vel), t0, t1)
        ident = float(res.f_lag * res.g_dot - res.g_lag * res.f_dot)
        assert ident == pytest.approx(1.0, abs=1e-12)

    def test_vs_scipy_dop853_random_orbits(self):
        """Independent ground truth across orbital regimes (batched)."""
        mu = GAUSS_GRAV_SQUARED
        rng = np.random.default_rng(42)
        n = 32
        # random bound + some unbound orbits
        r0 = rng.uniform(0.3, 5.0, (n, 1)) * _unit(rng, n)
        vcirc = np.sqrt(mu / np.linalg.norm(r0, axis=1, keepdims=True))
        v0 = vcirc * rng.uniform(0.3, 1.35, (n, 1)) * _unit(rng, n)
        dt = rng.uniform(-300, 300, n)

        res = propagate_universal(jnp.array(r0), jnp.array(v0), 0.0, jnp.array(dt))
        ok = _np(res.status) == 0
        assert ok.mean() > 0.9  # most random states propagate fine

        def rhs(_, y):
            r = y[:3]
            rn = np.linalg.norm(r)
            return np.concatenate([y[3:], -mu * r / rn**3])

        for i in range(n):
            if not ok[i]:
                continue
            sol = solve_ivp(
                rhs,
                (0.0, dt[i]),
                np.concatenate([r0[i], v0[i]]),
                method="DOP853",
                rtol=1e-12,
                atol=1e-14,
            )
            truth = sol.y[:, -1]
            assert np.linalg.norm(_np(res.r1[i]) - truth[:3]) < 1e-8, f"lane {i}"
            assert np.linalg.norm(_np(res.v1[i]) - truth[3:]) < 1e-8, f"lane {i}"

    def test_warm_start_matches_cold(self):
        pos, vel, t0, t1, _, _ = _PROPAG_FIXTURES[0]
        cold = propagate_universal(jnp.array(pos), jnp.array(vel), t0, t1)
        warm = propagate_universal(
            jnp.array(pos), jnp.array(vel), t0, t1, psi_guess=cold.psi
        )
        np.testing.assert_allclose(_np(warm.r1), _np(cold.r1), atol=1e-13)

    def test_degenerate_zero_position(self):
        res = propagate_universal(jnp.zeros(3), jnp.array([0.0, 0.01, 0.0]), 0.0, 1.0)
        assert int(res.status) != 0


def _unit(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


class TestVelocityCorrection:
    def test_recovers_exact_velocity(self):
        """If x1 is the true propagated position, f-g correction with the true
        v2 returns v2 itself (x1 = f*x2 + g*v2 identity)."""
        pos, vel, t0, t1, _, _ = _PROPAG_FIXTURES[0]
        x2 = jnp.array(pos)
        v2 = jnp.array(vel)
        dt = 5.0
        fwd = propagate_universal(x2, v2, 0.0, dt)
        x1 = fwd.r1
        res = velocity_correction(x1, x2, v2, dt, peri_max=1e3, ecc_max=5.0)
        assert int(res.status) == 0
        np.testing.assert_allclose(_np(res.v2_corrected), _np(v2), atol=1e-12)

    @pytest.mark.slow
    def test_perturbed_velocity_converges(self):
        """Iterating the correction from a perturbed velocity converges to
        the true one (the Gauss-iteration usage pattern)."""
        pos, vel, _, _, _, _ = _PROPAG_FIXTURES[1]
        x2 = jnp.array(pos)
        v_true = jnp.array(vel)
        dt = -8.0
        x1 = propagate_universal(x2, v_true, 0.0, dt).r1
        v = v_true * 1.02
        for _ in range(8):
            out = velocity_correction(x1, x2, v, dt, 1e3, 5.0)
            v = out.v2_corrected
        assert int(out.status) == 0
        np.testing.assert_allclose(_np(v), _np(v_true), atol=1e-12)

    def test_degenerate_angular_momentum(self):
        x = jnp.array([1.0, 0.0, 0.0])
        res = velocity_correction(x * 1.1, x, x * 0.01, 1.0, 1e3, 5.0)
        assert int(res.status) != 0

    @pytest.mark.slow
    def test_batched(self):
        pos, vel, _, _, _, _ = _PROPAG_FIXTURES[0]
        x2 = jnp.tile(jnp.array(pos), (5, 1))
        v2 = jnp.tile(jnp.array(vel), (5, 1))
        dts = jnp.linspace(-10, 10, 5)
        x1 = propagate_universal(x2, v2, 0.0, dts).r1
        res = velocity_correction(x1, x2, v2, dts, 1e3, 5.0)
        assert res.v2_corrected.shape == (5, 3)
        # dt=0 lane has unstable g; others must be clean
        st = _np(res.status)
        assert (st[np.abs(_np(dts)) > 1e-9] == 0).all()


class TestCcek1:
    def test_reference_oracle(self):
        # src/orb_elem.rs:330-368
        pos = jnp.array([-0.6235500510031639, 1.2114681148601605, 0.2520005914377604])
        vel = jnp.array([-1.5549845137774663e-2, -4.631577489268288e-3, -9.363362126133925e-4])
        out = ccek1(pos, vel)
        assert int(out.kind) == KIND_KEPLERIAN
        expected = [
            1.8155297166304232,
            0.2892182648825829,
            0.20434785751952972,
            0.0072890133690443745,
            1.2263737249473103,
            0.44554742955734405,
        ]
        np.testing.assert_allclose(_np(out.elements), expected, rtol=0, atol=5e-13)

    def test_energy_invariant(self):
        pos = jnp.array([-0.6235500510031639, 1.2114681148601605, 0.2520005914377604])
        vel = jnp.array([-1.5549845137774663e-2, -4.631577489268288e-3, -9.363362126133925e-4])
        out = ccek1(pos, vel)
        a = float(out.elements[0])
        r = float(jnp.linalg.norm(pos))
        v2 = float(jnp.sum(vel * vel))
        energy = v2 / 2 - GAUSS_GRAV_SQUARED / r
        assert energy == pytest.approx(-GAUSS_GRAV_SQUARED / (2 * a), abs=5e-12)

    def test_roundtrip_through_propagation(self):
        """ccek1 of a propagated state preserves (a, e, i, node, argp)."""
        pos = jnp.array([-0.6235500510031639, 1.2114681148601605, 0.2520005914377604])
        vel = jnp.array([-1.5549845137774663e-2, -4.631577489268288e-3, -9.363362126133925e-4])
        el0 = ccek1(pos, vel)
        prop = propagate_universal(pos, vel, 0.0, 123.456)
        el1 = ccek1(prop.r1, prop.v1)
        np.testing.assert_allclose(
            _np(el0.elements[:5]), _np(el1.elements[:5]), atol=1e-10
        )

    def test_hyperbolic_state(self):
        pos = jnp.array([1.0, 0.2, 0.1])
        vel = jnp.array([0.01, 0.025, 0.002])  # well above escape speed
        out = ccek1(pos, vel)
        assert int(out.kind) == 1
        assert float(out.elements[1]) > 1.0  # eccentricity
        assert float(out.elements[0]) > 0.0  # perihelion distance


class TestEccentricityControl:
    def test_accept_bound_orbit(self):
        pos = jnp.array([-0.6235500510031639, 1.2114681148601605, 0.2520005914377604])
        vel = jnp.array([-1.5549845137774663e-2, -4.631577489268288e-3, -9.363362126133925e-4])
        acc, ecc, peri, energy = eccentricity_control(pos, vel, 1e3, 1.0)
        assert bool(acc)
        assert float(ecc) == pytest.approx(0.2892182648825829, abs=1e-10)
        assert float(energy) < 0

    def test_reject_high_ecc(self):
        pos = jnp.array([1.0, 0.0, 0.0])
        vel = jnp.array([0.0, 0.025, 0.0])  # hyperbolic
        acc, ecc, _, _ = eccentricity_control(pos, vel, 1e3, 1.0)
        assert not bool(acc)
        assert float(ecc) > 1.0


class TestSolverJit:
    def test_jit_and_vmap_compose(self):
        pos, vel, t0, t1, er1, _ = _PROPAG_FIXTURES[0]

        f = jax.jit(lambda p, v, dt: propagate_universal(p, v, 0.0, dt))
        batch_p = jnp.tile(jnp.array(pos), (16, 1))
        batch_v = jnp.tile(jnp.array(vel), (16, 1))
        dts = jnp.full(16, t1 - t0)
        out = f(batch_p, batch_v, dts)
        np.testing.assert_allclose(_np(out.r1), np.tile(er1, (16, 1)), atol=1e-9)

    def test_fallback_rescues_hard_lane(self):
        """Near-parabolic high-e orbit: Newton may struggle; Auto must solve."""
        mu = GAUSS_GRAV_SQUARED
        a = 1.5
        e = 0.999
        r_peri = a * (1 - e)
        v_peri = np.sqrt(mu * (2 / r_peri - 1 / a))
        pos = jnp.array([r_peri, 0.0, 0.0])
        vel = jnp.array([0.0, v_peri, 0.0])
        res = propagate_universal(pos, vel, 0.0, 40.0)
        assert int(res.status) == 0
        # energy conserved
        e0 = 0.5 * v_peri**2 - mu / r_peri
        e1 = 0.5 * float(jnp.sum(res.v1**2)) - mu / float(jnp.linalg.norm(res.r1))
        assert e1 == pytest.approx(e0, rel=1e-9)


class TestPropertyStyle:
    """Random-grid invariants mirroring the reference's proptest suites
    (kepler/mod.rs:89-96 Stumpff invariants; params.rs:194-250 residual
    checks across regimes)."""

    def test_stumpff_invariants_random_grid(self):
        rng = np.random.default_rng(123)
        psi = rng.uniform(-80, 80, 4096)
        alpha = np.concatenate([
            -(10.0 ** rng.uniform(-6, 0.5, 2048)),
            10.0 ** rng.uniform(-6, -0.5, 2048),
        ])
        s0, s1, s2, s3 = (np.asarray(x) for x in s_funct(jnp.asarray(psi), jnp.asarray(alpha)))
        # defining relations s0 = 1 + alpha*s2, s1 = psi + alpha*s3
        np.testing.assert_allclose(s0, 1.0 + alpha * s2, rtol=3e-11, atol=3e-11)
        np.testing.assert_allclose(s1, psi + alpha * s3, rtol=3e-11, atol=3e-11)

    @pytest.mark.slow
    def test_kepler_residual_random_regimes(self):
        """solve_kepuni residuals vanish across random elliptic/hyperbolic
        parameter draws (parity: params.rs proptest)."""
        rng = np.random.default_rng(7)
        n = 2048
        mu = GAUSS_GRAV_SQUARED
        r0 = rng.uniform(0.1, 10.0, n)
        sig0 = rng.uniform(-0.05, 0.05, n)
        alpha = np.concatenate([
            -(10.0 ** rng.uniform(-4, 0.3, n // 2)),
            10.0 ** rng.uniform(-4, -0.5, n - n // 2),
        ])
        e0 = np.sqrt(np.maximum(1.0 + alpha * rng.uniform(0.001, 4.0, n) / mu, 0.0))
        dt = rng.uniform(-400, 400, n)
        p = KeplerParams(
            dt=jnp.asarray(dt), r0=jnp.asarray(r0), sig0=jnp.asarray(sig0),
            mu=jnp.full(n, mu), alpha=jnp.asarray(alpha), e0=jnp.asarray(e0),
        )
        sol = solve_kepuni(p, SolverConfig())
        conv = np.asarray(sol.converged)
        assert conv.mean() > 0.97
        res = np.asarray(
            p.r0 * sol.s1 + p.sig0 * sol.s2 + sol.s3 - jnp.sqrt(p.mu) * p.dt
        )
        tol = 1e-9 * (1.0 + np.abs(np.sqrt(mu) * dt))
        assert (np.abs(res)[conv] <= tol[conv]).all()


class TestVelocityCorrectionOracle:
    def test_real_data_oracle(self):
        """Exact-value oracle from velocity.rs:320-352 (real fink-fat data)."""
        x1 = jnp.asarray([-0.8435611261296833, 0.9372883273707728, 0.6591839010297766])
        x2 = jnp.asarray([-0.623121622917384, 1.0076797884556383, 0.7081256879844245])
        v2 = jnp.asarray([-1.5524310368624056e-2, -3.984104176604068e-3, -2.7640154361637183e-3])
        dt = 14.731970000000729
        res = velocity_correction(x1, x2, v2, dt, peri_max=1.0, ecc_max=1.0)
        assert int(res.status) == 0
        np.testing.assert_allclose(float(res.f), 0.9881648770972906, rtol=1e-12)
        np.testing.assert_allclose(float(res.g), 14.674676076120734, rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(res.v2_corrected),
            [-0.015524310248562921, -0.003984104769239458, -0.0027640155187336176],
            rtol=1e-11,
        )


class TestMpmathOracle:
    """Independent 50-digit ground truth via the CLASSICAL elements route
    (perifocal frame + Kepler's equation in mpmath) — a completely different
    formulation from the universal-variable kernel under test.  Mirrors the
    reference's gold standard (propagation.rs:218-263: scipy DOP853 +
    50-digit mpmath, 1e-9 norm tolerance)."""

    @staticmethod
    def _mp_propagate(r0, v0, dt, mu):
        import mpmath as mp

        mp.mp.dps = 50
        r0 = [mp.mpf(x) for x in r0]
        v0 = [mp.mpf(x) for x in v0]
        mu = mp.mpf(mu)
        dt = mp.mpf(dt)

        def dot(a, b):
            return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

        def cross(a, b):
            return [
                a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0],
            ]

        def norm(a):
            return mp.sqrt(dot(a, a))

        rn = norm(r0)
        v2 = dot(v0, v0)
        h = cross(r0, v0)
        evec = [
            cross(v0, h)[i] / mu - r0[i] / rn for i in range(3)
        ]
        e = norm(evec)
        a = 1 / (2 / rn - v2 / mu)
        w = [x / norm(h) for x in h]
        p = [x / e for x in evec]
        q = cross(w, p)

        if a > 0:  # elliptic
            n_mot = mp.sqrt(mu / a**3)
            cosE0 = (1 - rn / a) / e
            sinE0 = dot(r0, v0) / (e * mp.sqrt(mu * a))
            E0 = mp.atan2(sinE0, cosE0)
            M1 = E0 - e * mp.sin(E0) + n_mot * dt
            E1 = mp.findroot(lambda E: E - e * mp.sin(E) - M1, M1)
            b = mp.sqrt(1 - e**2)
            r1 = [
                a * (mp.cos(E1) - e) * p[i] + a * b * mp.sin(E1) * q[i]
                for i in range(3)
            ]
            r1n = a * (1 - e * mp.cos(E1))
            v1 = [
                mp.sqrt(mu * a) / r1n * (-mp.sin(E1) * p[i] + b * mp.cos(E1) * q[i])
                for i in range(3)
            ]
        else:  # hyperbolic
            am = -a
            n_mot = mp.sqrt(mu / am**3)
            coshH0 = (1 + rn / am) / e
            sinhH0 = dot(r0, v0) / (e * mp.sqrt(mu * am))
            H0 = mp.asinh(sinhH0) if coshH0 > 0 else mp.nan
            M1 = e * mp.sinh(H0) - H0 + n_mot * dt
            H1 = mp.findroot(lambda H: e * mp.sinh(H) - H - M1, mp.asinh(M1 / e) if abs(M1) > 1 else M1)
            b = mp.sqrt(e**2 - 1)
            r1 = [
                am * (e - mp.cosh(H1)) * p[i] + am * b * mp.sinh(H1) * q[i]
                for i in range(3)
            ]
            r1n = am * (e * mp.cosh(H1) - 1)
            v1 = [
                mp.sqrt(mu * am) / r1n * (-mp.sinh(H1) * p[i] + b * mp.cosh(H1) * q[i])
                for i in range(3)
            ]
        return [float(x) for x in r1], [float(x) for x in v1]

    @pytest.mark.parametrize(
        "a,e,dt_frac",
        [
            (1.5, 0.05, 0.37),    # quasi-circular
            (2.3, 0.7, 0.81),     # eccentric
            (1.1, 0.95, 0.02),    # near-perihelion high-e (stiffest)
            (3.0, 0.95, 5.33),    # high-e, multi-revolution arc
            (2.0, 0.3, -1.7),     # backward, >1 rev
            (-2.0, 1.5, 0.9),     # hyperbolic (dt in days via |a|-period scale)
        ],
    )
    def test_vs_50_digit_elements_route(self, a, e, dt_frac):
        mu = GAUSS_GRAV_SQUARED
        # state at a true anomaly of 40 deg in a tilted orbit
        import mpmath as mp

        mp.mp.dps = 50
        nu = mp.radians(40)
        p_slr = mp.mpf(a) * (1 - mp.mpf(e) ** 2)
        rmag = p_slr / (1 + mp.mpf(e) * mp.cos(nu))
        # perifocal state, then tilt by (i=25deg, node=80deg, argp=30deg)
        rp = [rmag * mp.cos(nu), rmag * mp.sin(nu), mp.mpf(0)]
        vfac = mp.sqrt(mp.mpf(mu) / p_slr)
        vp = [-vfac * mp.sin(nu), vfac * (mp.mpf(e) + mp.cos(nu)), mp.mpf(0)]

        def rot(axis, ang, v):
            c, s = mp.cos(ang), mp.sin(ang)
            x, y, z = v
            if axis == 2:
                return [c * x - s * y, s * x + c * y, z]
            return [x, c * y - s * z, s * y + c * z]

        def to_inertial(v):
            return rot(2, mp.radians(80), rot(0, mp.radians(25), rot(2, mp.radians(30), v)))

        r0 = [float(x) for x in to_inertial(rp)]
        v0 = [float(x) for x in to_inertial(vp)]
        period_scale = 2 * np.pi * np.sqrt(abs(a) ** 3 / mu)
        dt = dt_frac * period_scale

        er1, ev1 = self._mp_propagate(r0, v0, dt, mu)
        res = propagate_universal(jnp.array(r0), jnp.array(v0), 0.0, dt)
        assert int(res.status) == 0
        assert np.linalg.norm(_np(res.r1) - np.array(er1)) < 1e-9
        assert np.linalg.norm(_np(res.v1) - np.array(ev1)) < 1e-9
