"""DOP853 integrator and N-body propagation with STM.

Cross-validation strategy (the reference's own N-body tests are
self-generated): Sun-only N-body must reproduce the closed-form two-body
propagation — two completely independent code paths — and STM Jacobians
must match finite differences.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp

from outfit_tpu.constants import GAUSS_GRAV_SQUARED
from outfit_tpu.elements.twobody import propagate_twobody
from outfit_tpu.elements.types import EquinoctialElements, KeplerianElements, keplerian_to_equinoctial
from outfit_tpu.ephem import JPLEphem, Body
from outfit_tpu.propagator import NBodyConfig, dop853_integrate, propagate_nbody
from outfit_tpu.propagator.nbody import perturber_snapshots, _acceleration_and_gradient


@pytest.fixture(scope="module")
def eph():
    return JPLEphem.analytic(56900.0, 57400.0)


@pytest.fixture(scope="module")
def eqel():
    kep = KeplerianElements(
        *map(jnp.float64, (57000.0, 2.3, 0.15, 0.12, 1.1, 0.7, 0.3))
    )
    return keplerian_to_equinoctial(kep)


class TestDop853:
    def test_exponential_decay(self):
        r = dop853_integrate(
            lambda t, y: -y, jnp.ones((4, 1)), 0.0, jnp.array([1.0, 2.0, 5.0, -1.0]),
            rtol=1e-12, atol=1e-14,
        )
        assert (np.asarray(r.status) == 0).all()
        np.testing.assert_allclose(
            np.asarray(r.y[:, 0]), np.exp([-1.0, -2.0, -5.0, 1.0]), atol=1e-12
        )

    def test_orbit_vs_scipy(self):
        mu = GAUSS_GRAV_SQUARED
        y0 = jnp.array([2.0, 0.0, 0.0, 0.0, 0.011, 0.002])

        def rhs(t, y):
            r = y[..., :3]
            rn = jnp.linalg.norm(r, axis=-1, keepdims=True)
            return jnp.concatenate([y[..., 3:], -mu * r / rn**3], axis=-1)

        out = dop853_integrate(rhs, y0, 0.0, 500.0, rtol=1e-12, atol=1e-14)
        assert int(out.status) == 0

        def rhs_np(t, y):
            r = y[:3]
            rn = np.linalg.norm(r)
            return np.concatenate([y[3:], -mu * r / rn**3])

        ref = solve_ivp(rhs_np, (0, 500.0), np.asarray(y0), method="DOP853",
                        rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(out.y), ref.y[:, -1], atol=5e-10)

    def test_backward_integration(self):
        r = dop853_integrate(lambda t, y: -y, jnp.ones((1,)), 2.0, 0.0)
        assert float(r.y[0]) == pytest.approx(np.exp(2.0), rel=1e-10)

    def test_step_budget_failure(self):
        # stiff-ish blowup with absurdly small budget -> status 1
        r = dop853_integrate(lambda t, y: y * y, jnp.full((1,), 1.0), 0.0, 0.999,
                             max_steps=3)
        assert int(r.status) == 1


class TestNBody:
    def test_sun_only_matches_twobody(self, eph, eqel):
        nb = propagate_nbody(eqel, 57030.0, eph, NBodyConfig())
        tb = propagate_twobody(eqel, 57000.0, 57030.0)
        assert int(nb.status) == 0
        np.testing.assert_allclose(
            np.asarray(nb.position), np.asarray(tb.position), atol=1e-11
        )
        np.testing.assert_allclose(
            np.asarray(nb.velocity), np.asarray(tb.velocity), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(nb.dpos_delem), np.asarray(tb.dpos_delem), atol=1e-9
        )

    def test_backward_arc(self, eph, eqel):
        nb = propagate_nbody(eqel, 56970.0, eph, NBodyConfig())
        tb = propagate_twobody(eqel, 57000.0, 56970.0)
        assert int(nb.status) == 0
        np.testing.assert_allclose(
            np.asarray(nb.position), np.asarray(tb.position), atol=1e-11
        )

    def test_planet_perturbations_magnitude(self, eph, eqel):
        nbp = propagate_nbody(eqel, 57030.0, eph, NBodyConfig.with_planets())
        tb = propagate_twobody(eqel, 57000.0, 57030.0)
        dr = float(jnp.linalg.norm(nbp.position - tb.position))
        # main-belt object, 30-day arc: planetary perturbation ~1e-7..1e-4 AU
        assert 1e-8 < dr < 1e-4

    def test_stm_jacobian_vs_finite_differences(self, eph, eqel):
        cfg = NBodyConfig.with_planets()
        base = propagate_nbody(eqel, 57030.0, eph, cfg)
        for j, field in enumerate(
            ["semi_major_axis", "h", "k", "p", "q", "mean_longitude"]
        ):
            eps = 1e-7
            pert = eqel._replace(**{field: getattr(eqel, field) + eps})
            out = propagate_nbody(pert, 57030.0, eph, cfg)
            fd = (np.asarray(out.position) - np.asarray(base.position)) / eps
            an = np.asarray(base.dpos_delem)[j]
            np.testing.assert_allclose(an, fd, rtol=2e-5, atol=1e-8)

    def test_zero_dt_short_circuit(self, eph, eqel):
        nb = propagate_nbody(eqel, 57000.0, eph, NBodyConfig.with_planets())
        tb = propagate_twobody(eqel, 57000.0, 57000.0)
        np.testing.assert_allclose(np.asarray(nb.position), np.asarray(tb.position), atol=0)
        assert int(nb.status) == 0

    def test_batched(self, eph, eqel):
        batch = EquinoctialElements(*[jnp.tile(f, 5) for f in eqel])
        t1 = 57000.0 + jnp.linspace(-20, 20, 5)
        nb = propagate_nbody(batch, t1, eph, NBodyConfig())
        assert nb.position.shape == (5, 3)
        assert (np.asarray(nb.status) == 0).all()
        tb = propagate_twobody(batch, 57000.0, t1)
        np.testing.assert_allclose(np.asarray(nb.position), np.asarray(tb.position), atol=1e-11)

    def test_indirect_term_sign(self, eph):
        """Physical check of the corrected indirect term: for a massless body
        AT the Sun's location, total acceleration from a single non-Sun
        perturber must vanish to first order... more simply, verify the
        acceleration formula against an explicit two-term computation."""
        cfg = NBodyConfig(perturbing_bodies=(int(Body.SUN), int(Body.JUPITER_BARY)))
        pp, gm = perturber_snapshots(eph, cfg, jnp.float64(57000.0))
        r = jnp.array([1.5, 0.3, 0.05])
        acc, _ = _acceleration_and_gradient(r, pp, gm)
        # manual: sun two-body + jupiter direct + jupiter indirect (MINUS sign)
        rj = np.asarray(pp)[1]
        d = np.asarray(r) - rj
        manual = (
            -gm[0] * np.asarray(r) / np.linalg.norm(r) ** 3
            - gm[1] * d / np.linalg.norm(d) ** 3
            - gm[1] * rj / np.linalg.norm(rj) ** 3
        )
        np.testing.assert_allclose(np.asarray(acc), manual, rtol=1e-14)


class TestBatchIsolation:
    def test_dop853_lane_independent(self):
        """A lane's integration must not depend on what shares the batch:
        done lanes are frozen (h=0, accept masked) while slower lanes keep
        the while-loop alive.  Kepler orbits of very different periods force
        very different step counts per lane."""
        from outfit_tpu.constants import GAUSS_GRAV_SQUARED

        mu = GAUSS_GRAV_SQUARED

        def rhs(t, y):
            r = y[..., :3]
            v = y[..., 3:]
            rn = jnp.linalg.norm(r, axis=-1, keepdims=True)
            return jnp.concatenate([v, -mu * r / rn**3], axis=-1)

        # a=1 (fast, many steps) vs a=30 (slow, few steps) vs eccentric
        y0 = jnp.asarray(np.array([
            [1.0, 0.0, 0.0, 0.0, np.sqrt(mu), 0.0],
            [30.0, 0.0, 0.0, 0.0, np.sqrt(mu / 30.0), 0.0],
            [0.5, 0.0, 0.1, 0.0, np.sqrt(mu * 3.0), 0.0],
        ]))
        t0 = jnp.zeros(3)
        t1 = jnp.full(3, 60.0)
        batch = dop853_integrate(rhs, y0, t0, t1, rtol=1e-12, atol=1e-12)
        for i in range(3):
            alone = dop853_integrate(
                rhs, y0[i:i + 1], t0[i:i + 1], t1[i:i + 1],
                rtol=1e-12, atol=1e-12,
            )
            np.testing.assert_array_equal(
                np.asarray(batch.status)[i], np.asarray(alone.status)[0]
            )
            np.testing.assert_array_equal(
                np.asarray(batch.n_steps)[i], np.asarray(alone.n_steps)[0]
            )
            # XLA lowers the stage math slightly differently per batch
            # shape (ulp noise); the trajectory itself must agree far below
            # the integration tolerance
            np.testing.assert_allclose(
                np.asarray(batch.y)[i], np.asarray(alone.y)[0],
                rtol=1e-10, atol=1e-13,
            )


class TestNBodyVsScipy:
    def test_perturbed_arc_matches_scipy_dop853(self, eph, eqel):
        """Full perturbed dynamics (all planets, frozen at t0) integrated
        independently with scipy DOP853 at 1e-13 — validates the perturber
        assembly (frames, GMs, direct+indirect terms), not just the
        integrator."""
        from scipy.integrate import solve_ivp

        from outfit_tpu.elements import propagate_twobody
        from outfit_tpu.constants import GAUSS_GRAV_SQUARED
        from outfit_tpu.propagator.nbody import perturber_snapshots

        cfg = NBodyConfig.with_planets()
        t0, t1 = 57000.0, 57040.0
        pert, gm = perturber_snapshots(eph, cfg, jnp.float64(t0))
        pert = np.asarray(pert)  # (P, 3) heliocentric ecliptic, frozen
        gm = np.asarray(gm)

        init = propagate_twobody(eqel, 0.0, 0.0, compute_derivatives=False)
        y0 = np.concatenate([np.asarray(init.position), np.asarray(init.velocity)])

        def rhs(t, y):
            r, v = y[:3], y[3:]
            d = r[None, :] - pert
            dn = np.linalg.norm(d, axis=1)
            acc = -(gm / dn**3) @ d
            rp = np.linalg.norm(pert, axis=1)
            live = rp > 1e-10
            acc -= (gm[live] / rp[live] ** 3) @ pert[live]
            return np.concatenate([v, acc])

        sol = solve_ivp(
            rhs, (0.0, t1 - t0), y0, method="DOP853", rtol=1e-13, atol=1e-14
        )
        nb = propagate_nbody(eqel, t1, eph, cfg)
        assert int(nb.status) == 0
        np.testing.assert_allclose(
            np.asarray(nb.position), sol.y[:3, -1], atol=1e-11
        )
        np.testing.assert_allclose(
            np.asarray(nb.velocity), sol.y[3:, -1], atol=1e-12
        )
        # and the perturbation is real (differs from pure two-body)
        tb = propagate_twobody(eqel, t0, t1, compute_derivatives=False)
        assert np.linalg.norm(np.asarray(tb.position) - sol.y[:3, -1]) > 1e-8


class TestTimeVaryingPerturbers:
    """``NBodyConfig(frozen_perturbers=False)`` — perturber positions
    interpolated at every integrator stage time (extension over the
    reference's t0 snapshot, which is only accurate for arcs <~30 d)."""

    @pytest.mark.slow
    def test_short_arc_matches_frozen(self, eph, eqel):
        """Over a 2-day arc the perturbers barely move: snapshot and
        time-varying dynamics must agree far below the perturbation size."""
        cfg_f = NBodyConfig.with_planets()
        cfg_v = NBodyConfig(
            perturbing_bodies=cfg_f.perturbing_bodies, frozen_perturbers=False
        )
        a = propagate_nbody(eqel, 57002.0, eph, cfg_f)
        b = propagate_nbody(eqel, 57002.0, eph, cfg_v)
        assert int(a.status) == 0 and int(b.status) == 0
        np.testing.assert_allclose(
            np.asarray(a.position), np.asarray(b.position), atol=5e-10
        )

    @pytest.mark.slow
    def test_long_arc_matches_scipy_with_moving_jupiter(self, eph, eqel):
        """200-day Jupiter-perturbed arc vs an independent scipy DOP853
        whose RHS interpolates Jupiter from a dense sample of the SAME
        ephemeris (CubicSpline, 0.25-day grid: interpolation error is
        ~(dt^4/384)*w^4*|r| ~ 1e-16 AU for Jupiter's 4333-day period)."""
        from scipy.interpolate import CubicSpline

        from outfit_tpu.constants import ROT_EQUMJ2000_TO_ECLMJ2000

        cfg = NBodyConfig(
            perturbing_bodies=(int(Body.SUN), int(Body.JUPITER_BARY)),
            frozen_perturbers=False,
        )
        t0, t1 = 57000.0, 57200.0
        gm_sun = GAUSS_GRAV_SQUARED
        from outfit_tpu.ephem.bodies import gm_au3_day2

        gm_jup = gm_au3_day2(Body.JUPITER_BARY)

        grid = np.arange(t0 - 1.0, t1 + 1.25, 0.25)
        p_equ, _ = eph.body_ephemeris(Body.JUPITER_BARY, jnp.asarray(grid))
        rot = np.asarray(ROT_EQUMJ2000_TO_ECLMJ2000)
        p_ecl = np.asarray(p_equ) @ rot.T
        jup = CubicSpline(grid - t0, p_ecl)

        init = propagate_twobody(eqel, 0.0, 0.0, compute_derivatives=False)
        y0 = np.concatenate(
            [np.asarray(init.position), np.asarray(init.velocity)]
        )

        def rhs(t, y):
            r, v = y[:3], y[3:]
            rj = jup(t)
            d = r - rj
            acc = (
                -gm_sun * r / np.linalg.norm(r) ** 3
                - gm_jup * d / np.linalg.norm(d) ** 3
                - gm_jup * rj / np.linalg.norm(rj) ** 3
            )
            return np.concatenate([v, acc])

        sol = solve_ivp(
            rhs, (0.0, t1 - t0), y0, method="DOP853", rtol=1e-13, atol=1e-14
        )
        nb = propagate_nbody(eqel, t1, eph, cfg)
        assert int(nb.status) == 0
        np.testing.assert_allclose(
            np.asarray(nb.position), sol.y[:3, -1], atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(nb.velocity), sol.y[3:, -1], atol=1e-11
        )
        # the frozen snapshot is measurably WRONG on this arc — the
        # extension is doing real physical work
        frozen = propagate_nbody(
            eqel, t1, eph,
            NBodyConfig(perturbing_bodies=cfg.perturbing_bodies),
        )
        assert (
            np.linalg.norm(np.asarray(frozen.position) - sol.y[:3, -1]) > 1e-7
        )

    def test_stm_jacobian_vs_finite_differences(self, eph, eqel):
        """The variational equations stay exact under moving perturbers
        (da/dr is evaluated at the same time-varying positions)."""
        cfg = NBodyConfig(
            perturbing_bodies=(int(Body.SUN), int(Body.JUPITER_BARY)),
            frozen_perturbers=False,
        )
        base = propagate_nbody(eqel, 57060.0, eph, cfg)
        eps = 1e-7
        pert = eqel._replace(h=eqel.h + eps)
        out = propagate_nbody(pert, 57060.0, eph, cfg)
        fd = (np.asarray(out.position) - np.asarray(base.position)) / eps
        an = np.asarray(base.dpos_delem)[1]
        np.testing.assert_allclose(an, fd, rtol=2e-5, atol=1e-8)

    def test_config_dict_round_trip(self):
        from outfit_tpu.propagator.config import PropagatorKind

        pk = PropagatorKind(
            nbody=True,
            config=NBodyConfig(frozen_perturbers=False),
        )
        assert PropagatorKind.from_dict(pk.to_dict()) == pk
