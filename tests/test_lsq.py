"""Differential correction: closure, outlier rejection, fallbacks, fixtures.

The reference validates against DE440-based oracles at 1e-10
(``tests/test_diff_cor.rs``); without network, correctness is carried by
closure tests (exact recovery of synthesized orbits — a *stronger* check
than regression pinning) plus structural parity tests.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from outfit_tpu.constants import RADSEC, ROT_ECLMJ2000_TO_EQUMJ2000
from outfit_tpu.elements.twobody import propagate_twobody
from outfit_tpu.elements.types import (
    EquinoctialElements,
    KeplerianElements,
    keplerian_to_equinoctial,
)
from outfit_tpu.ephem import JPLEphem
from outfit_tpu.iod import IODParams
from outfit_tpu.iod.scoring import apparent_radec
from outfit_tpu.lsq import DifferentialCorrectionConfig, fit_lsq
from outfit_tpu.observations import ErrorModel, ObsDataset
from outfit_tpu.observations.observatories import Observer

DATA = os.path.join(os.path.dirname(__file__), "data")
_IOD = IODParams(n_noise_realizations=3)


@pytest.fixture(scope="module")
def eph():
    return JPLEphem.analytic(53500.0, 61500.0)


def _synth_dataset(eph, kep_true, epochs, sigma_arcsec=0.5, noise=None, tid="SYNTH", ds=None):
    eq_true = keplerian_to_equinoctial(kep_true)
    t0 = float(kep_true.reference_epoch)
    st = propagate_twobody(
        EquinoctialElements(*[jnp.broadcast_to(f, epochs.shape) for f in eq_true]),
        t0, jnp.asarray(epochs), compute_derivatives=False,
    )
    rot = jnp.asarray(ROT_ECLMJ2000_TO_EQUMJ2000)
    earth, _ = eph.earth_ephemeris(jnp.asarray(epochs))
    ra, dec = apparent_radec(
        jnp.einsum("ij,...j->...i", rot, st.position),
        jnp.einsum("ij,...j->...i", rot, st.velocity),
        earth,
    )
    ra = np.asarray(ra).copy()
    dec = np.asarray(dec).copy()
    if noise is not None:
        rng = np.random.default_rng(noise)
        ra += rng.normal(0, sigma_arcsec * RADSEC, ra.shape) / np.cos(dec)
        dec += rng.normal(0, sigma_arcsec * RADSEC, dec.shape)
    if ds is None:
        ds = ObsDataset()
    for i, t in enumerate(epochs):
        ds.push_observation(
            tid, float(t), float(ra[i]), float(dec[i]),
            sigma_arcsec * RADSEC, sigma_arcsec * RADSEC, Observer.geocenter(),
        )
    return ds


_KEP_TRUE = (57000.0, 2.3, 0.15, 0.12, 1.1, 0.7, 0.3)
_EPOCHS = 57000.0 + np.array([0.0, 1.0, 2.0, 5.0, 8.0, 12.0, 15.0, 20.0, 25.0, 30.0, 35.0, 40.0])


class TestDebiasing:
    @pytest.mark.slow
    def test_bias_is_subtracted_from_residuals(self, eph):
        """Parity with ObsFitData.bias (obs_fit_data.rs:29-116,
        single_iteration.rs:196-207): fitting biased observations WITH the
        matching bias vector must reproduce the unbiased fit."""
        kep_true = KeplerianElements(*map(jnp.float64, _KEP_TRUE))
        ds_clean = _synth_dataset(eph, kep_true, _EPOCHS)

        bias = 2.0 * RADSEC  # 2 arcsec systematic catalog offset
        ds_biased = _synth_dataset(eph, kep_true, _EPOCHS)
        ds_biased.ra = ds_biased.ra + bias
        ds_biased.dec = ds_biased.dec - bias
        ds_biased.set_bias(
            np.full(len(ds_biased), bias), np.full(len(ds_biased), -bias)
        )

        r_clean = fit_lsq(ds_clean, eph, _IOD, seed=42)["SYNTH"]
        r_debiased = fit_lsq(ds_biased, eph, _IOD, seed=42)["SYNTH"]
        assert r_clean.ok and r_debiased.ok
        assert not r_debiased.fell_back_to_iod
        # the LSQ fixed point is defined by the debiased residuals: same
        # orbit to the Newton convergence tolerance (seeds differ slightly
        # because the IOD stage sees the biased angles)
        np.testing.assert_allclose(
            r_debiased.equinoctial, r_clean.equinoctial, rtol=1e-7, atol=1e-9
        )
        # and ignoring the bias shifts the orbit measurably
        ds_nobias = _synth_dataset(eph, kep_true, _EPOCHS)
        ds_nobias.ra = ds_nobias.ra + bias
        ds_nobias.dec = ds_nobias.dec - bias
        r_raw = fit_lsq(ds_nobias, eph, _IOD, seed=42)["SYNTH"]
        assert np.abs(r_raw.equinoctial - r_clean.equinoctial).max() > 1e-6

    def test_bias_respected_by_mixed_precision_prewarm(self, eph):
        """The f32 pre-warm must fit the DEBIASED residuals too (regression:
        it rebuilt ObsArrays without bias_ra/bias_dec, converging toward the
        biased optimum before handing over to the f64 loop)."""
        from outfit_tpu.lsq.config import DifferentialCorrectionConfig

        kep_true = KeplerianElements(*map(jnp.float64, _KEP_TRUE))
        bias = 2.0 * RADSEC
        ds = _synth_dataset(eph, kep_true, _EPOCHS)
        ds.ra = ds.ra + bias
        ds.dec = ds.dec - bias
        ds.set_bias(np.full(len(ds), bias), np.full(len(ds), -bias))

        r64 = fit_lsq(
            ds, eph, _IOD, DifferentialCorrectionConfig(precision="f64"), seed=42
        )["SYNTH"]
        rmx = fit_lsq(
            ds, eph, _IOD, DifferentialCorrectionConfig(precision="mixed"), seed=42
        )["SYNTH"]
        assert r64.ok and rmx.ok
        np.testing.assert_allclose(
            rmx.equinoctial, r64.equinoctial, rtol=1e-7, atol=1e-9
        )


class TestClosure:
    @pytest.mark.slow
    def test_exact_recovery(self, eph):
        kep_true = KeplerianElements(*map(jnp.float64, _KEP_TRUE))
        ds = _synth_dataset(eph, kep_true, _EPOCHS)
        res = fit_lsq(ds, eph, _IOD, seed=42)
        r = res["SYNTH"]
        assert r.ok and not r.fell_back_to_iod
        assert r.normalised_rms < 1e-6
        kep = r.keplerian
        assert float(kep.semi_major_axis) == pytest.approx(2.3, abs=1e-9)
        assert float(kep.eccentricity) == pytest.approx(0.15, abs=1e-9)
        assert float(kep.inclination) == pytest.approx(0.12, abs=1e-9)
        assert float(kep.ascending_node_longitude) == pytest.approx(1.1, abs=1e-8)
        assert float(kep.periapsis_argument) == pytest.approx(0.7, abs=1e-8)
        assert r.uncertainties is not None and (r.uncertainties > 0).all()

    @pytest.mark.slow
    def test_zero_noise_no_precision_flips(self, eph):
        """Mixed-vs-f64 optimum flips vanish when the chi2 surface is not
        seed-degenerate (VERDICT r3 next-round #2).  The bench's accuracy
        certificate reports ~37% of NOISY synthetic rows settling at a
        different chi2 point between precisions, attributed to seed
        sensitivity in flat valleys rather than precision error.  This
        pins that attribution: with ZERO observation noise every arc has
        a unique sharp optimum (the truth), so the two precisions MUST
        land on the same optimum for every trajectory — flip count == 0
        by the certificate's own same-basin criterion
        (|dnRMS| < 1e-6 * (1 + nRMS))."""
        rng = np.random.default_rng(20)
        ds = None
        truths = {}
        for i in range(16):
            kep = KeplerianElements(*map(jnp.float64, (
                57000.0,
                float(rng.uniform(1.3, 3.2)),
                float(rng.uniform(0.02, 0.3)),
                float(rng.uniform(0.02, 0.5)),
                float(rng.uniform(0, 2 * np.pi)),
                float(rng.uniform(0, 2 * np.pi)),
                float(rng.uniform(0, 2 * np.pi)),
            )))
            tid = f"Z{i:02d}"
            truths[tid] = kep
            ds = _synth_dataset(
                eph, kep, _EPOCHS + float(rng.uniform(0, 0.5)),
                tid=tid, ds=ds,
            )
        p = IODParams(n_noise_realizations=2)
        # grace=2: tolerate the routine transient RMS overshoot of the
        # first Newton step from a Gauss seed (the bench production config)
        r64 = fit_lsq(
            ds, eph, p,
            DifferentialCorrectionConfig(
                precision="f64", divergence_grace_iterations=2
            ),
            seed=9,
        )
        rmx = fit_lsq(
            ds, eph, IODParams(n_noise_realizations=2, precision="mixed"),
            DifferentialCorrectionConfig(
                precision="mixed", divergence_grace_iterations=2
            ),
            seed=9,
        )
        flips = []
        for tid in truths:
            a, b = r64[tid], rmx[tid]
            assert a.ok and not a.fell_back_to_iod, f"{tid}: {a.error}"
            assert b.ok and not b.fell_back_to_iod, f"{tid}: {b.error}"
            # same-basin: the certificate's criterion, extended for the
            # zero-residual regime — with no noise both fits drive nRMS
            # to ~0 but stop at different residual FLOORS under the same
            # step-norm threshold (measured: 1e-6 vs 1e-10), which is the
            # same optimum, not a flip
            same = (
                abs(b.normalised_rms - a.normalised_rms)
                < 1e-6 * (1.0 + abs(a.normalised_rms))
            ) or (a.normalised_rms < 1e-4 and b.normalised_rms < 1e-4)
            if not same:
                flips.append((tid, a.normalised_rms, b.normalised_rms))
            # same optimum means same ORBIT at polish grade.  The two
            # precisions may seed from different IOD triplets, so the LSQ
            # reference epochs can differ; (a, h, k, p, q) are
            # epoch-invariant, and the mean longitudes must agree after
            # advancing to a common epoch at the fitted mean motion
            # n = k_gauss / a^1.5
            ea, eb = np.asarray(a.equinoctial), np.asarray(b.equinoctial)
            np.testing.assert_allclose(
                eb[:5], ea[:5], rtol=1e-8, atol=1e-10, err_msg=tid
            )
            from outfit_tpu.constants import GAUSS_GRAV

            n_mot = GAUSS_GRAV / float(ea[0]) ** 1.5
            lam_b_at_a = eb[5] + n_mot * (a.epoch - b.epoch)
            dlam = (lam_b_at_a - ea[5] + np.pi) % (2 * np.pi) - np.pi
            assert abs(dlam) < 1e-7, f"{tid}: dlambda {dlam:.2e}"
        assert not flips, f"precision flips on zero-noise arcs: {flips}"

    def test_noisy_recovery_within_uncertainty(self, eph):
        kep_true = KeplerianElements(*map(jnp.float64, _KEP_TRUE))
        ds = _synth_dataset(eph, kep_true, _EPOCHS, noise=11)
        res = fit_lsq(ds, eph, _IOD, seed=42)
        r = res["SYNTH"]
        assert r.ok and not r.fell_back_to_iod
        assert 0.3 < r.normalised_rms < 2.5  # ~chi2-consistent fit
        # fitted a within ~5 sigma_a of truth
        eq_true = keplerian_to_equinoctial(kep_true)
        da = abs(float(r.equinoctial[0]) - float(eq_true.semi_major_axis))
        assert da < 5.0 * float(r.uncertainties[0])

    @pytest.mark.slow
    def test_multi_trajectory_batch(self, eph):
        ds = _synth_dataset(
            eph, KeplerianElements(*map(jnp.float64, _KEP_TRUE)), _EPOCHS
        )
        kep_b = KeplerianElements(*map(jnp.float64, (57000.0, 1.7, 0.25, 0.3, 2.2, 0.4, 1.5)))
        ds = _synth_dataset(eph, kep_b, _EPOCHS + 0.37, tid="B", ds=ds)
        res = fit_lsq(ds, eph, _IOD, seed=42)
        assert res["SYNTH"].ok and res["B"].ok
        assert float(res["B"].keplerian.semi_major_axis) == pytest.approx(1.7, abs=1e-8)

    @pytest.mark.slow
    def test_mixed_width_batch_matches_solo_fits(self, eph):
        """Width-grouped dispatch regression: a batch mixing obs counts that
        land in different padded-width buckets (8 / 16 / 32) must reproduce
        each trajectory's solo fit (composition contract + the left-packed
        column slice being lossless).

        Tolerance 1e-11: width-bucket coalescing may run a trajectory at a
        wider padded obs width than its solo fit, and the masked reductions
        over the obs axis then accumulate in a different shape (~1e-12
        noise on converged elements).  Both runs land in the same
        chi-squared minimum; the convergence contract is 1e-4."""
        keps = {
            "W8": ((57000.0, 2.3, 0.15, 0.12, 1.1, 0.7, 0.3), _EPOCHS[:8]),
            "W16": ((57000.0, 1.7, 0.25, 0.3, 2.2, 0.4, 1.5), _EPOCHS + 0.37),
            "W32": (
                (57000.0, 2.9, 0.1, 0.5, 0.3, 1.9, 2.4),
                57000.0 + np.linspace(0.0, 42.0, 20),
            ),
        }
        iod_p = IODParams(n_noise_realizations=2, max_triplets=3)
        solo = {}
        for tid, (kt, ep) in keps.items():
            d = _synth_dataset(
                eph, KeplerianElements(*map(jnp.float64, kt)), ep,
                noise=13, tid=tid,
            )
            solo[tid] = fit_lsq(d, eph, iod_p, seed=9)[tid]
        ds = None
        for tid, (kt, ep) in keps.items():
            ds = _synth_dataset(
                eph, KeplerianElements(*map(jnp.float64, kt)), ep,
                noise=13, tid=tid, ds=ds,
            )
        mixed = fit_lsq(ds, eph, iod_p, seed=9)
        for tid in keps:
            assert mixed[tid].ok == solo[tid].ok
            np.testing.assert_allclose(
                mixed[tid].equinoctial, solo[tid].equinoctial,
                rtol=0, atol=1e-11,
            )
            assert mixed[tid].n_active_obs == solo[tid].n_active_obs


class TestOutlierRejection:
    def test_outlier_is_rejected(self, eph):
        kep_true = KeplerianElements(*map(jnp.float64, _KEP_TRUE))
        ds = _synth_dataset(eph, kep_true, _EPOCHS, noise=5)
        # corrupt one observation by ~40 sigma in Dec
        ds.dec[6] += 20.0 * RADSEC
        res = fit_lsq(ds, eph, _IOD, seed=42)
        r = res["SYNTH"]
        assert r.ok and not r.fell_back_to_iod
        assert r.n_active_obs == len(_EPOCHS) - 1  # exactly the outlier dropped
        assert float(r.keplerian.semi_major_axis) == pytest.approx(2.3, abs=1e-3)
        assert r.normalised_rms < 2.5

    def test_rejection_can_be_disabled(self, eph):
        kep_true = KeplerianElements(*map(jnp.float64, _KEP_TRUE))
        ds = _synth_dataset(eph, kep_true, _EPOCHS, noise=5)
        ds.dec[6] += 20.0 * RADSEC
        cfg = DifferentialCorrectionConfig(enable_outlier_rejection=False)
        res = fit_lsq(ds, eph, _IOD, config=cfg, seed=42)
        r = res["SYNTH"]
        assert r.ok
        assert r.n_active_obs == len(_EPOCHS)  # nothing rejected
        assert r.normalised_rms > 2.5  # outlier inflates the fit


class TestConfig:
    def test_fixed_element_stays_fixed(self, eph):
        kep_true = KeplerianElements(*map(jnp.float64, _KEP_TRUE))
        ds = _synth_dataset(eph, kep_true, _EPOCHS, noise=2)
        res0 = fit_lsq(ds, eph, _IOD, seed=42)
        a_seed = float(res0["SYNTH"].iod.equinoctial[0])
        cfg = DifferentialCorrectionConfig(
            free_elements=(False, True, True, True, True, True)
        )
        ds2 = _synth_dataset(eph, kep_true, _EPOCHS, noise=2)
        res = fit_lsq(ds2, eph, _IOD, config=cfg, seed=42)
        r = res["SYNTH"]
        assert r.ok
        assert float(r.equinoctial[0]) == pytest.approx(a_seed, abs=0.0)

    def test_bizarre_seed_falls_back(self, eph):
        """A seed pushed to bizarre limits must fall back to the IOD orbit."""
        from outfit_tpu.iod.api import FitResult

        kep_true = KeplerianElements(*map(jnp.float64, _KEP_TRUE))
        ds = _synth_dataset(eph, kep_true, _EPOCHS)
        bogus = FitResult(
            "SYNTH", ok=True, rms=1.0, epoch=57015.0, kind=0,
            elements=np.zeros(6),
            equinoctial=np.array([2.0e4, 3.0, 3.0, 0.0, 0.0, 1.0]),  # e~4.2, a=2e4
        )
        res = fit_lsq(ds, eph, _IOD, seed=42, initial_orbits={"SYNTH": bogus})
        r = res["SYNTH"]
        assert r.fell_back_to_iod
        assert r.error is not None


class TestFixtures:
    @pytest.mark.slow
    def test_k25d50b_distant_object_with_divergence_tweak(self, eph):
        """K25D50B (9-day arc of an a~13 AU Centaur): the default
        divergence check misflags the routine first-step RMS overshoot of
        a short distant-object arc, falling back to the IOD orbit — and
        the reference documents exactly this operating point: relax
        ``rms_divergence_ratio`` to 10 (tests/test_diff_cor.rs:50-56) plus
        the grace iterations.  Pins that the tweak recovers a genuine LSQ
        convergence (nRMS ~0.217, a ~13 AU)."""
        ds = ObsDataset.from_mpc_80_col(f"{DATA}/K25D50B.obs")
        r_default = fit_lsq(
            ds, eph, _IOD, seed=42, error_model=ErrorModel.fcct14()
        )["K25D50B"]
        assert r_default.fell_back_to_iod  # the documented default outcome

        cfg = DifferentialCorrectionConfig(
            rms_divergence_ratio=10.0, divergence_grace_iterations=2
        )
        r = fit_lsq(
            ObsDataset.from_mpc_80_col(f"{DATA}/K25D50B.obs"), eph, _IOD,
            cfg, seed=42, error_model=ErrorModel.fcct14(),
        )["K25D50B"]
        assert r.ok and not r.fell_back_to_iod, r.error
        assert r.normalised_rms < 0.5
        kep = r.keplerian
        assert 11.0 < float(kep.semi_major_axis) < 15.0
        assert float(kep.eccentricity) < 0.5

    @pytest.mark.slow
    def test_2015ab_lsq(self, eph):
        ds = ObsDataset.from_mpc_80_col(f"{DATA}/2015AB.obs")
        res = fit_lsq(ds, eph, _IOD, seed=42, error_model=ErrorModel.fcct14())
        # photom contract: 2015AB.obs is ONE trajectory (K09R05F + its
        # K15A00B recovery designation, 37 obs over 2009-2015)
        assert list(res) == ["K09R05F"]
        r = res["K09R05F"]
        assert r.ok, r.error
        assert not r.fell_back_to_iod
        kep = r.keplerian
        # reference DE440 integration oracle (test_gauss_iod.rs:24-38):
        # a=1.801740836, e=0.283562595 — the analytic ephemeris carries a
        # ~1e-4 floor
        assert float(kep.semi_major_axis) == pytest.approx(1.801740836, abs=2e-3)
        assert float(kep.eccentricity) == pytest.approx(0.283562595, abs=2e-3)
        assert r.covariance is not None
        # covariance symmetric positive-diagonal
        np.testing.assert_allclose(r.covariance, r.covariance.T, atol=1e-20)
        assert (np.diag(r.covariance) > 0).all()


class TestNBodyLsq:
    @pytest.mark.slow
    def test_nbody_propagator_converges(self, eph):
        """Diff-cor with the N-body propagator on a short synthetic arc
        (parity: the N-body sections of tests/test_diff_cor.rs)."""
        from outfit_tpu.propagator.config import NBodyConfig, PropagatorKind

        kep_true = KeplerianElements(*map(jnp.float64, _KEP_TRUE))
        epochs = 57000.0 + np.array([0.0, 3.0, 7.0, 12.0, 18.0, 25.0])
        ds = _synth_dataset(eph, kep_true, epochs)
        cfg = DifferentialCorrectionConfig(
            propagator=PropagatorKind.n_body(NBodyConfig()),
            enable_outlier_rejection=False,
        )
        res = fit_lsq(ds, eph, _IOD, config=cfg, seed=42)
        r = res["SYNTH"]
        assert r.ok and not r.fell_back_to_iod
        # synthesis was two-body; Sun-only N-body must recover it exactly
        assert float(r.keplerian.semi_major_axis) == pytest.approx(2.3, abs=1e-7)
        assert r.normalised_rms < 1e-4


class TestDivergenceGrace:
    """divergence_grace_iterations=k exempts the first k Newton steps from
    the 1.5x divergence cut (default 0 = reference diff_cor.rs:356 parity);
    a Gauss seed's first full step routinely overshoots transiently."""

    @pytest.mark.slow
    def test_grace_recovers_transient_overshoot(self):
        import numpy as np
        from __graft_entry__ import _synthetic_batch
        from outfit_tpu.iod.api import _iod_kernel_jit
        from outfit_tpu.iod.params import IODParams
        from outfit_tpu.lsq.iteration import ObsArrays
        from outfit_tpu.lsq.loop import (
            STATUS_DIVERGED,
            STATUS_OK,
            run_differential_correction,
        )

        n_traj, n_obs = 32, 12
        tri, obs_arrays, lane_traj, window = _synthetic_batch(n_traj, 8, n_obs, seed=7)
        out = _iod_kernel_jit(
            tri, obs_arrays, lane_traj, window,
            IODParams(n_noise_realizations=3, precision="mixed").validated(),
        )
        best_rms, _k, _e, eqv, epoch, _c = out
        seed_eq = np.asarray(eqv)  # per-trajectory (device-side argmin)
        seed_ep = np.asarray(epoch)
        mjd, ra, dec, sra, sdec, helio = obs_arrays
        obs = ObsArrays(
            mjd, ra, dec, sra, sdec,
            jnp.broadcast_to(jnp.asarray(helio), (n_traj, n_obs, 3)),
            jnp.ones((n_traj, n_obs), bool),
        )
        st0 = np.asarray(
            run_differential_correction(
                jnp.asarray(seed_eq), jnp.asarray(seed_ep), obs,
                DifferentialCorrectionConfig(),
            ).status
        )
        res2 = run_differential_correction(
            jnp.asarray(seed_eq), jnp.asarray(seed_ep), obs,
            DifferentialCorrectionConfig(divergence_grace_iterations=2),
        )
        st2 = np.asarray(res2.status)
        # grace strictly recovers fits (never loses one)
        assert (st2 == STATUS_OK).sum() > (st0 == STATUS_OK).sum()
        assert ((st0 == STATUS_OK) & (st2 != STATUS_OK)).sum() == 0
        # the recovered fits are genuinely converged, not just unflagged
        rec = (st0 == STATUS_DIVERGED) & (st2 == STATUS_OK)
        assert rec.any()
        assert np.median(np.asarray(res2.normalised_rms)[rec]) < 1e-3


@pytest.mark.slow
def test_mixed_precision_with_nbody_propagator():
    """precision='mixed' + an N-body propagator must run (the f32 pre-warm
    and f32 Jacobians are two-body-only and gate themselves off; the DOP853
    + STM integrator is f64)."""
    from outfit_tpu.propagator.config import NBodyConfig, PropagatorKind

    ds = ObsDataset.from_mpc_80_col_files(
        [f"{DATA}/2015AB.obs"]
    )
    eph = JPLEphem("analytic:builtin")
    cfg = DifferentialCorrectionConfig(
        divergence_grace_iterations=2,
        precision="mixed",
        propagator=PropagatorKind.n_body(NBodyConfig()),
        max_newton_iterations=5,
    )
    res = fit_lsq(
        ds, eph,
        iod_params=IODParams(precision="mixed", n_noise_realizations=2),
        config=cfg, seed=0,
    )
    assert all(r.ok for r in res.values())
    assert res["K09R05F"].normalised_rms < 1.0


def test_diff_cor_reference_oracle_2015ab(eph):
    """Full-pipeline oracle from tests/test_diff_cor.rs:73-170 (DE440,
    seed 42): merged K09R05F equinoctial fit.  With the builtin analytic
    ephemeris (~1e-5 AU vs DE440) the elements land within 2e-4 of the
    reference and the 1-sigma uncertainties within a factor ~2 (they depend
    on the exact outlier selection under the differing ephemeris)."""
    ds = ObsDataset.from_mpc_80_col(f"{DATA}/2015AB.obs")
    res = fit_lsq(
        ds, eph,
        iod_params=IODParams(
            n_noise_realizations=10, noise_scale=1.1,
            max_obs_for_triplets=130, max_triplets=30, precision="mixed",
        ),
        config=DifferentialCorrectionConfig(
            precision="mixed", divergence_grace_iterations=2
        ),
        seed=42, error_model=ErrorModel.fcct14(),
    )
    r = res["K09R05F"]
    assert r.ok and not r.fell_back_to_iod
    ref_eq = [1.801837227645679, 0.26941036025991355, 0.08909600747061494,
              0.0008708024189761142, 0.10166598640878513, 1.6929834276945714]
    np.testing.assert_allclose(r.equinoctial, ref_eq, atol=3e-4)
    ref_unc = [1.3935756201273647e-6, 2.399103573371585e-6,
               9.380584628466963e-6, 4.2486965596206456e-7,
               9.938054593077774e-7, 1.5699462542222023e-5]
    ratio = np.asarray(r.uncertainties) / ref_unc
    assert (ratio > 0.3).all() and (ratio < 3.0).all()


def test_diff_cor_reference_oracle_8467_33803(eph):
    """Full-pipeline oracles from tests/test_diff_cor.rs:190-300 (DE440,
    seed 42) for the two numbered asteroids.  Measured agreement under the
    builtin analytic ephemeris: 33803 (129-obs multi-year arc) within
    4e-6..3e-4; 8467 within 0.2 formal sigma (sigma_a = 7.6e-3)."""
    ds = ObsDataset.from_mpc_80_col_files(
        [f"{DATA}/8467.obs", f"{DATA}/33803.obs"]
    )
    res = fit_lsq(
        ds, eph,
        iod_params=IODParams(
            n_noise_realizations=10, noise_scale=1.1,
            max_obs_for_triplets=130, max_triplets=30, precision="mixed",
        ),
        config=DifferentialCorrectionConfig(
            precision="mixed", divergence_grace_iterations=2
        ),
        seed=42, error_model=ErrorModel.fcct14(),
    )
    r = res["33803"]
    assert r.ok and not r.fell_back_to_iod
    np.testing.assert_allclose(
        r.equinoctial,
        [2.190614169340076, -0.13393967896355405, 0.1533932583177835,
         0.002997272576917091, -0.05948928702443621, 4.224671691074116],
        atol=5e-4,
    )
    r = res["8467"]
    assert r.ok and not r.fell_back_to_iod
    np.testing.assert_allclose(
        r.equinoctial[:3],
        [3.2073734821020743, 0.053597752212361474, -0.023229330026225303],
        atol=3e-3,  # ~0.4 of its formal sigma_a = 7.6e-3
    )


class TestStreamPipeline:
    """fit_lsq_stream must produce exactly fit_lsq's results per dataset
    (the pipelining is a scheduling change only)."""

    def test_stream_equals_sequential(self, eph):
        from outfit_tpu.lsq import fit_lsq_stream

        datasets = [
            ObsDataset.from_mpc_80_col(f"{DATA}/{n}.obs")
            for n in ("2015AB", "8467", "33803")
        ]
        cfg = DifferentialCorrectionConfig()
        streamed = list(
            fit_lsq_stream(iter(datasets), eph, _IOD, cfg, seed=42, depth=2)
        )
        assert [id(d) for d, _ in streamed] == [id(d) for d in datasets]
        for ds, res in streamed:
            # fresh copies: fit_lsq mutates error-model fields in place
            ref = fit_lsq(ds, eph, _IOD, cfg, seed=42)
            assert set(res) == set(ref)
            for tid in res:
                a, b = res[tid], ref[tid]
                assert a.ok == b.ok and a.fell_back_to_iod == b.fell_back_to_iod
                if a.ok and not a.fell_back_to_iod:
                    np.testing.assert_allclose(
                        a.equinoctial, b.equinoctial, rtol=0, atol=0
                    )
                    np.testing.assert_allclose(
                        a.normalised_rms, b.normalised_rms, rtol=0, atol=0
                    )

    def test_slim_fetch_stream(self, eph):
        """slim_fetch=True: elements/rms/status bitwise-equal to the
        sequential fit; covariance and 1-sigma float32-rounded only."""
        from outfit_tpu.lsq import fit_lsq_stream

        ds = ObsDataset.from_mpc_80_col(f"{DATA}/8467.obs")
        cfg = DifferentialCorrectionConfig()
        ((_, res),) = fit_lsq_stream(
            [ds], eph, _IOD, cfg, seed=42, slim_fetch=True
        )
        ref = fit_lsq(ds, eph, _IOD, cfg, seed=42)
        assert set(res) == set(ref)
        for tid in res:
            a, b = res[tid], ref[tid]
            assert a.ok == b.ok and a.fell_back_to_iod == b.fell_back_to_iod
            assert a.error == b.error
            if a.ok and not a.fell_back_to_iod:
                np.testing.assert_allclose(a.equinoctial, b.equinoctial, rtol=0, atol=0)
                np.testing.assert_allclose(
                    a.normalised_rms, b.normalised_rms, rtol=0, atol=0
                )
                assert a.covariance.dtype == b.covariance.dtype == np.float64
                np.testing.assert_allclose(a.covariance, b.covariance, rtol=2e-7)
                np.testing.assert_allclose(
                    a.uncertainties, b.uncertainties, rtol=2e-7
                )
                # the slim values really are the f32 rounding of the exact ones
                np.testing.assert_array_equal(
                    a.covariance, b.covariance.astype(np.float32).astype(np.float64)
                )


class TestDegenerateInputs:
    """No-panic contract on nonsense data (diff_cor.rs:525-568): the full
    IOD->LSQ pipeline must return typed per-trajectory errors (or a fit),
    never raise, for astrometry that corresponds to no physical orbit."""

    def _run(self, eph, build):
        ds = ObsDataset()
        geo = Observer.geocenter()
        build(ds, geo)
        res = fit_lsq(
            ds, eph, IODParams(n_noise_realizations=2),
            DifferentialCorrectionConfig(), seed=3,
        )
        assert set(res) == set(ds.traj_ids)
        for tid, r in res.items():
            if not r.ok:
                assert isinstance(r.error, str) and r.error, tid
        return res

    def test_all_zero_radec(self, eph):
        def build(ds, geo):
            for i, t in enumerate(np.linspace(0, 30, 8)):
                ds.push_observation(
                    "ZERO", 57000.0 + t, 0.0, 0.0, 1e-6, 1e-6, geo
                )
        self._run(eph, build)

    def test_random_sky_scatter(self, eph):
        rng = np.random.default_rng(11)

        def build(ds, geo):
            for t in np.linspace(0, 25, 9):
                ds.push_observation(
                    "RND", 57000.0 + t,
                    float(rng.uniform(0, 2 * np.pi)),
                    float(rng.uniform(-1.4, 1.4)),
                    1e-6, 1e-6, geo,
                )
        self._run(eph, build)

    def test_identical_epochs(self, eph):
        def build(ds, geo):
            for _ in range(6):
                ds.push_observation(
                    "SAME_T", 57000.0, 1.0, 0.2, 1e-6, 1e-6, geo
                )
        res = self._run(eph, build)
        assert not res["SAME_T"].ok  # zero arc: no feasible triplet

    def test_mixed_good_and_degenerate(self, eph):
        """A garbage trajectory must not poison a good one in the same batch
        (errors-as-data isolation)."""
        kep = KeplerianElements(
            *map(jnp.float64, (57000.0, 2.3, 0.15, 0.12, 1.1, 0.7, 0.3))
        )
        epochs = 57000.0 + np.linspace(0, 30, 8)

        def build(ds, geo):
            _synth_dataset(eph, kep, epochs, tid="GOOD", ds=ds)
            rng = np.random.default_rng(5)
            for t in np.linspace(0, 20, 7):
                ds.push_observation(
                    "BAD", 57000.0 + t,
                    float(rng.uniform(0, 2 * np.pi)),
                    float(rng.uniform(-1.4, 1.4)),
                    1e-6, 1e-6, geo,
                )
        res = self._run(eph, build)
        assert res["GOOD"].ok and res["GOOD"].normalised_rms < 2.0


class TestLsqBatchIsolation:
    """run_differential_correction must be bitwise lane-independent: a
    trajectory's outcome cannot depend on what else shares the batch (the
    masked Newton/outlier while-loops run at the batch-max trip count; done
    lanes must be fully frozen).  Mirror of
    tests/test_iod.py::TestBatchIsolation."""

    def _batch(self, eph, T=5, N=10):
        from outfit_tpu.lsq.iteration import ObsArrays

        rng = np.random.default_rng(11)
        els, eps, rows = [], [], []
        rot = jnp.asarray(ROT_ECLMJ2000_TO_EQUMJ2000)
        for i in range(T):
            kep = KeplerianElements(*map(jnp.float64, (
                57000.0,
                float(rng.uniform(1.2, 3.0)),
                float(rng.uniform(0.0, 0.5)),
                float(rng.uniform(0.0, 0.4)),
                float(rng.uniform(0, 2 * np.pi)),
                float(rng.uniform(0, 2 * np.pi)),
                float(rng.uniform(0, 2 * np.pi)),
            )))
            eq = keplerian_to_equinoctial(kep)
            t = 57000.0 + np.sort(rng.uniform(0, 40, N))
            st = propagate_twobody(
                EquinoctialElements(*[jnp.broadcast_to(f, (N,)) for f in eq]),
                57000.0, jnp.asarray(t), compute_derivatives=False,
            )
            earth, _ = eph.earth_ephemeris(jnp.asarray(t))
            ra, dec = apparent_radec(
                jnp.einsum("ij,...j->...i", rot, st.position),
                jnp.einsum("ij,...j->...i", rot, st.velocity),
                earth,
            )
            # noise levels from clean to junk (divergent/bizarre lanes)
            nz = [0.0, 2e-6, 2e-5, 5e-4, 5e-2][i % 5]
            ra = np.asarray(ra) + rng.normal(0, nz, N)
            dec = np.asarray(dec) + rng.normal(0, nz, N)
            # seed perturbed off the truth so Newton has real work
            seed = np.asarray(eq[1:], dtype=np.float64) * (
                1.0 + 1e-3 * rng.normal(size=6)
            )
            els.append(seed)
            eps.append(57000.0)
            rows.append((t, ra, dec, np.asarray(earth)))
        obs = ObsArrays(
            jnp.asarray(np.stack([r[0] for r in rows])),
            jnp.asarray(np.stack([r[1] for r in rows])),
            jnp.asarray(np.stack([r[2] for r in rows])),
            jnp.asarray(np.full((T, N), 2.4e-6)),
            jnp.asarray(np.full((T, N), 2.4e-6)),
            jnp.asarray(np.stack([r[3] for r in rows])),
            jnp.asarray(np.ones((T, N), bool)),
        )
        return jnp.asarray(np.stack(els)), jnp.asarray(np.array(eps)), obs

    @pytest.mark.parametrize("precision,rtol,atol", [
        ("f64", 1e-6, 1e-9),
        # mixed: the f32 phases carry f32-ulp lowering noise, and a flipped
        # final iteration leaves elements a step apart inside the 1e-4
        # convergence contract — agreement is at the convergence level
        ("mixed", 3e-5, 1e-8),
    ])
    @pytest.mark.slow
    def test_lane_independent(self, eph, precision, rtol, atol):
        from outfit_tpu.lsq.iteration import ObsArrays
        from outfit_tpu.lsq.loop import run_differential_correction

        el, ep, obs = self._batch(eph)
        cfg = DifferentialCorrectionConfig(precision=precision)
        batch = run_differential_correction(el, ep, obs, cfg)
        # XLA fuses the (T, N, 6) partial computations differently per batch
        # size (measured: 1-ulp differences in d_ra/d_dec between T=5 and
        # T=1 on CPU), so float outputs carry ~1e-13 lowering noise and the
        # contract is: DISCRETE outcomes bitwise, floats at 1e-9 (far below
        # the 1e-4 convergence threshold).  Trip-count coupling through loop
        # state (the kepler warm-start carry) IS a bug and is gated out.
        discrete = ("status", "selection", "num_measurements")
        for i in range(el.shape[0]):
            one_obs = ObsArrays(*[
                (None if f is None else f[i:i + 1]) for f in obs
            ])
            alone = run_differential_correction(
                el[i:i + 1], ep[i:i + 1], one_obs, cfg
            )
            # mixed mode's float guarantees apply to WELL-POSED fits: on
            # junk lanes (nRMS >> 1: 100-arcsec scatter against 0.5-arcsec
            # sigmas) the chi-squared valley is flat and the f32 prewarm's
            # lowering noise legitimately lands the f64 loop on a different
            # point of it.  Discrete decisions must match everywhere.
            well_posed = float(np.asarray(batch.normalised_rms)[i]) < 2.0
            for name in batch._fields:
                if (
                    precision == "mixed"
                    and not well_posed
                    and name not in discrete
                ):
                    continue
                b = np.asarray(getattr(batch, name))[i]
                a = np.asarray(getattr(alone, name))[0]
                msg = f"traj {i} field {name} depends on batch composition"
                if name in discrete:
                    np.testing.assert_array_equal(b, a, err_msg=msg)
                elif name == "total_newton_iterations":
                    # iteration counts are batch-stable in f64; in mixed
                    # mode the f32 prewarm's OWN control flow (plateau/done
                    # checks at f32 resolution) legitimately diverges under
                    # batch-shape-dependent XLA lowering noise, so only the
                    # converged decisions/values are the contract there
                    if precision == "f64":
                        np.testing.assert_array_equal(b, a, err_msg=msg)
                elif name in ("covariance", "normal_matrix"):
                    # matrix entries span ~12 decades with near-cancelling
                    # off-diagonals: elementwise relative error is dominated
                    # by the smallest entries — compare at matrix scale
                    scale = np.nanmax(np.abs(b)) if np.isfinite(b).any() else 1.0
                    np.testing.assert_allclose(
                        b, a, rtol=rtol, atol=rtol * scale + atol,
                        equal_nan=True, err_msg=msg,
                    )
                else:
                    # near-zero quantities (clean-lane RMS ~1e-6) make
                    # relative comparison meaningless; atol dominates there
                    np.testing.assert_allclose(
                        b, a, rtol=rtol, atol=atol, equal_nan=True, err_msg=msg
                    )


class TestEscalation:
    """fit_lsq_escalating: lean stage first, rich stage only on failures.

    Composition contract (per-trajectory fold_in seeds) implies each
    trajectory's stage-k result is independent of which other trajectories
    escalated with it, so the tiered result must match the corresponding
    direct single-stage fits."""

    def _two_traj(self, eph):
        ds = _synth_dataset(
            eph, KeplerianElements(*map(jnp.float64, _KEP_TRUE)), _EPOCHS,
            noise=5, tid="A",
        )
        kep_b = KeplerianElements(
            *map(jnp.float64, (57000.0, 1.7, 0.25, 0.3, 2.2, 0.4, 1.5))
        )
        return _synth_dataset(eph, kep_b, _EPOCHS + 0.37, noise=5, tid="B", ds=ds)

    @pytest.mark.slow
    def test_failed_trajectories_escalate(self, eph):
        from outfit_tpu.lsq import fit_lsq_escalating

        ds = self._two_traj(eph)
        # stage 0: perihelion cap between the two orbits' q — rejects A
        # (q ~ 1.96 AU) at eccentricity control, accepts B (q ~ 1.28 AU)
        lean = IODParams(n_noise_realizations=3, max_perihelion_au=1.6)
        rich = IODParams(n_noise_realizations=3)
        cfg = DifferentialCorrectionConfig()
        tiered = fit_lsq_escalating(
            ds, eph, [(lean, cfg), (rich, cfg)], seed=42
        )
        assert set(tiered) == {"A", "B"}
        assert tiered["A"].ok and tiered["B"].ok

        lean_res = fit_lsq(self._two_traj(eph), eph, lean, cfg, seed=42)
        assert not lean_res["A"].ok  # sanity: A really fails stage 0
        a_idx = ds.trajectory_obs_indices("A")
        rich_a = fit_lsq(ds.subset(a_idx), eph, rich, cfg, seed=42)
        np.testing.assert_allclose(
            tiered["A"].equinoctial, rich_a["A"].equinoctial, rtol=0, atol=1e-11
        )
        np.testing.assert_allclose(
            tiered["B"].equinoctial, lean_res["B"].equinoctial, rtol=0, atol=1e-11
        )

    def test_single_stage_equals_fit_lsq(self, eph):
        from outfit_tpu.lsq import fit_lsq_escalating

        ds = self._two_traj(eph)
        plain = fit_lsq(self._two_traj(eph), eph, _IOD, seed=42)
        tiered = fit_lsq_escalating(
            ds, eph, [(_IOD, DifferentialCorrectionConfig())], seed=42
        )
        for tid in ("A", "B"):
            assert tiered[tid].ok == plain[tid].ok
            np.testing.assert_allclose(
                tiered[tid].equinoctial, plain[tid].equinoctial, rtol=0, atol=0
            )

    @pytest.mark.slow
    def test_stream_escalating_patches_failures(self, eph):
        """fit_lsq_stream_escalating: the lean stage streams, failures
        from several datasets are re-fit in ONE batched rich pass and
        patched into the yielded tables.  With n_noise_realizations=0
        the fits are seed-path-independent, so every escalated row must
        equal a direct rich fit of that trajectory alone (the batch-
        isolation contract across the cross-dataset failure merge)."""
        from outfit_tpu.lsq import fit_lsq_stream_escalating

        def build(shift):
            ds = _synth_dataset(
                eph, KeplerianElements(*map(jnp.float64, _KEP_TRUE)),
                _EPOCHS + shift, noise=int(5 + shift * 100), tid="A",
            )
            kep_b = KeplerianElements(
                *map(jnp.float64, (57000.0, 1.7, 0.25, 0.3, 2.2, 0.4, 1.5))
            )
            return _synth_dataset(
                eph, kep_b, _EPOCHS + 0.37 + shift,
                noise=int(9 + shift * 100), tid="B", ds=ds,
            )

        datasets = [build(0.0), build(0.05), build(0.11)]
        # stage 0 rejects A (q ~ 1.96 AU) via the perihelion cap; B passes
        lean = IODParams(n_noise_realizations=0, max_perihelion_au=1.6)
        rich = IODParams(n_noise_realizations=0)
        cfg = DifferentialCorrectionConfig()

        out = list(fit_lsq_stream_escalating(
            [build(0.0), build(0.05), build(0.11)], eph,
            [(lean, cfg), (rich, cfg)], seed=42, flush_every=2,
        ))
        assert len(out) == 3
        for k, (ds_out, res) in enumerate(out):
            assert list(ds_out.traj_ids) == ["A", "B"]
            ra = res["A"] if isinstance(res, dict) else res.result("A")
            rb = res["B"] if isinstance(res, dict) else res.result("B")
            assert ra.ok and rb.ok
            # escalated A == direct rich solo fit (bitwise-grade)
            a_idx = datasets[k].trajectory_obs_indices("A")
            solo = fit_lsq(
                datasets[k].subset(a_idx), eph, rich, cfg, seed=42
            )["A"]
            np.testing.assert_allclose(
                np.asarray(ra.equinoctial), np.asarray(solo.equinoctial),
                rtol=0, atol=1e-11,
            )
            # B must be untouched lean output
            lean_b = fit_lsq(datasets[k], eph, lean, cfg, seed=42)["B"]
            np.testing.assert_allclose(
                np.asarray(rb.equinoctial), np.asarray(lean_b.equinoctial),
                rtol=0, atol=1e-11,
            )


    def test_stream_escalating_user_retry_if_sees_converged_rows(self, eph):
        """A user-supplied retry_if must be applied to EVERY row — the
        columnar fast path may only pre-filter with the converged mask for
        the DEFAULT predicate (ADVICE r4: a predicate escalating converged
        rows, e.g. on high nRMS, was never consulted for them).  Stage 1
        here rejects A at the perihelion cap, so the patched row must
        become a failed row with the lean stage's IOD columns fully
        cleared (LsqTable.patch_row resets iod_* to inert fill)."""
        from outfit_tpu.lsq import fit_lsq_stream_escalating
        from outfit_tpu.lsq.table import IOD_OK, LsqTable

        ds = self._two_traj(eph)
        lean = IODParams(n_noise_realizations=0)
        reject_a = IODParams(n_noise_realizations=0, max_perihelion_au=1.6)
        cfg = DifferentialCorrectionConfig()

        # sanity: A converges under the lean stage — the predicate must
        # have seen a CONVERGED row to escalate it
        lean_res = fit_lsq(self._two_traj(eph), eph, lean, cfg, seed=42)
        assert lean_res["A"].ok and not lean_res["A"].fell_back_to_iod

        out = list(fit_lsq_stream_escalating(
            [ds], eph, [(lean, cfg), (reject_a, cfg)], seed=42,
            retry_if=lambda r: r.traj_id == "A",
        ))
        assert len(out) == 1
        _ds_out, res = out[0]
        assert isinstance(res, LsqTable)
        ra = res.result("A")
        assert not ra.ok  # stage 1 rejected A's perihelion: IOD failed
        i = res.traj_ids.index("A")
        assert not res.iod_ok[i]
        assert res.iod_error_code[i] != IOD_OK
        assert not res.kept[i]
        assert np.isnan(res.iod_elements[i]).all()
        assert np.isnan(res.equinoctial[i]).all()
        # B converged lean and was not escalated by the predicate
        rb = res.result("B")
        assert rb.ok and not rb.fell_back_to_iod

    def test_stream_escalating_multistage_retry_uses_clean_ids(self, eph):
        """With >=3 stages, the stage-k -> k+1 retry predicate must see
        CLEAN trajectory ids, not the merged '<hi>|<tid>' prefix (ADVICE
        r4 follow-up): a traj_id-inspecting predicate drives A through
        stage 1 (which rejects it at the perihelion cap) and must still
        escalate it to stage 2, whose result lands in the final table."""
        from outfit_tpu.lsq import fit_lsq_stream_escalating

        ds = self._two_traj(eph)
        lean = IODParams(n_noise_realizations=0)
        reject_a = IODParams(n_noise_realizations=0, max_perihelion_au=1.6)
        rich = IODParams(n_noise_realizations=0, max_triplets=12)
        cfg = DifferentialCorrectionConfig()

        out = list(fit_lsq_stream_escalating(
            [ds], eph,
            [(lean, cfg), (reject_a, cfg), (rich, cfg)], seed=42,
            retry_if=lambda r: r.traj_id == "A",
        ))
        _ds_out, res = out[0]
        ra = res.result("A")
        # the old code compared the prefixed id '0|A' against 'A' in the
        # stage-1 -> 2 retry set, so A stayed a stage-1 IOD failure
        assert ra.ok, ra.error
        a_idx = ds.trajectory_obs_indices("A")
        solo = fit_lsq(
            self._two_traj(eph).subset(a_idx), eph, rich, cfg, seed=42
        )["A"]
        np.testing.assert_allclose(
            np.asarray(ra.equinoctial), np.asarray(solo.equinoctial),
            rtol=0, atol=1e-11,
        )


class TestLsqTable:
    """Columnar results (``as_table=True``) must materialize EXACTLY the
    dict-mode results — including error strings, fallback semantics, and
    the lazily-built per-row ``iod`` FitResult — across success,
    IOD-failure, and host-screened rows."""

    _RESULT_FIELDS = (
        "ok", "error", "fell_back_to_iod", "normalised_rms", "epoch",
        "n_active_obs", "total_newton_iterations",
    )
    _IOD_FIELDS = ("ok", "error", "rms", "corrected", "epoch", "kind")

    def _mixed_dataset(self, eph):
        # one convergent real arc + one 2-obs trajectory (host-screened
        # NoFeasibleTriplets) + one nonsense trajectory (device IOD failure)
        ds = ObsDataset.from_mpc_80_col(f"{DATA}/8467.obs")
        geo = Observer.geocenter()
        for t in (57000.0, 57000.01):
            ds.push_observation("SHORT", t, 1.0, 0.2, 1e-6, 1e-6, geo)
        for t in np.linspace(0, 30, 8):
            ds.push_observation("ZERO", 57000.0 + t, 0.0, 0.0, 1e-6, 1e-6, geo)
        return ds

    def _assert_equal(self, ref, tab_results):
        assert set(ref) == set(tab_results)
        for tid in ref:
            a, b = ref[tid], tab_results[tid]
            for f in self._RESULT_FIELDS:
                va, vb = getattr(a, f), getattr(b, f)
                same = (va == vb) or (va != va and vb != vb)  # NaN==NaN
                assert same, (tid, f, va, vb)
            for f in ("equinoctial", "covariance", "uncertainties"):
                va, vb = getattr(a, f), getattr(b, f)
                if va is None or vb is None:
                    assert va is None and vb is None, (tid, f)
                else:
                    np.testing.assert_array_equal(
                        np.asarray(va), np.asarray(vb), err_msg=f"{tid}.{f}"
                    )
            ia, ib = a.iod, b.iod
            if ia is None or ib is None:
                assert ia is None and ib is None, (tid, "iod")
                continue
            for f in self._IOD_FIELDS:
                va, vb = getattr(ia, f), getattr(ib, f)
                same = (va == vb) or (va != va and vb != vb)
                assert same, (tid, "iod." + f, va, vb)
            for f in ("elements", "equinoctial"):
                va, vb = getattr(ia, f), getattr(ib, f)
                if va is None or vb is None:
                    assert va is None and vb is None, (tid, "iod." + f)
                else:
                    np.testing.assert_array_equal(
                        np.asarray(va), np.asarray(vb),
                        err_msg=f"{tid}.iod.{f}",
                    )

    @pytest.mark.slow
    def test_table_parity_mixed(self, eph):
        cfg = DifferentialCorrectionConfig()
        ref = fit_lsq(self._mixed_dataset(eph), eph, _IOD, cfg, seed=42)
        tab = fit_lsq(
            self._mixed_dataset(eph), eph, _IOD, cfg, seed=42, as_table=True
        )
        # the failure rows really exercise the non-kept / failed branches
        assert not ref["SHORT"].ok and "NoFeasibleTriplets" in ref["SHORT"].error
        assert not tab.kept[tab.traj_ids.index("SHORT")]
        self._assert_equal(ref, tab.to_results())
        # vectorized columns line up with per-row results
        i = tab.traj_ids.index("8467")
        assert tab.converged[i] and tab.ok[i]
        np.testing.assert_array_equal(
            tab.covariance[i], ref["8467"].covariance
        )

    def test_table_stream(self, eph):
        from outfit_tpu.lsq import fit_lsq_stream

        cfg = DifferentialCorrectionConfig()
        ref = fit_lsq(self._mixed_dataset(eph), eph, _IOD, cfg, seed=42)
        ((_, tab),) = fit_lsq_stream(
            [self._mixed_dataset(eph)], eph, _IOD, cfg, seed=42,
            as_table=True,
        )
        self._assert_equal(ref, tab.to_results())

    def test_table_dataframe(self, eph):
        pd = pytest.importorskip("pandas")
        tab = fit_lsq(
            self._mixed_dataset(eph), eph, _IOD,
            DifferentialCorrectionConfig(), seed=42, as_table=True,
        )
        df = tab.to_dataframe()
        assert len(df) == len(tab.traj_ids)
        row = df[df.traj_id == "8467"].iloc[0]
        assert bool(row.converged)
        i = tab.traj_ids.index("8467")
        assert row.eq_a == tab.equinoctial[i, 0]
        assert row.cov_00 == tab.covariance_tri[i, 0]
        assert row.sigma_a == tab.uncertainties[i, 0]
        # failed rows carry NaN element columns, not garbage
        assert np.isnan(df[df.traj_id == "SHORT"].iloc[0].eq_a)

    def test_table_getitem(self, eph):
        tab = fit_lsq(
            ObsDataset.from_mpc_80_col(f"{DATA}/8467.obs"), eph, _IOD,
            DifferentialCorrectionConfig(), seed=42, as_table=True,
        )
        r = tab["8467"]
        assert r.ok and r.covariance is not None
        with pytest.raises(KeyError):
            tab["nope"]


class TestMinimalFetch:
    """``minimal_fetch=True`` keeps the IOD element vectors on device and
    back-fills only the rows whose result consumes them.  Contract: every
    column a result actually uses is IDENTICAL to the full fetch; the
    converged rows' ``iod_elements``/``iod_equinoctial`` are NaN."""

    _SHARED_COLS = (
        "kept", "iod_ok", "iod_error_code", "iod_rms", "iod_kind",
        "iod_corrected", "iod_epoch", "ok", "converged",
        "fell_back_to_iod", "status", "normalised_rms", "epoch",
        "equinoctial", "covariance_tri", "uncertainties", "n_active_obs",
        "total_newton_iterations",
    )

    def _tables(self, eph, cfg):
        mixed = TestLsqTable._mixed_dataset
        full = fit_lsq(mixed(self, eph), eph, _IOD, cfg, seed=42, as_table=True)
        from outfit_tpu.lsq.api import fit_lsq_dispatch, fit_lsq_finalize

        pend = fit_lsq_dispatch(
            mixed(self, eph), eph, _IOD, cfg, seed=42, as_table=True,
            minimal_fetch=True,
        )
        assert pend.minimal, "mixed dataset should hit a minimal-capable path"
        assert pend.st.get("deferred_iod") is not None
        return full, fit_lsq_finalize(pend)

    def _assert_contract(self, full, mini):
        assert full.traj_ids == mini.traj_ids
        for col in self._SHARED_COLS:
            np.testing.assert_array_equal(
                getattr(full, col), getattr(mini, col), err_msg=col
            )
        used = mini.iod_ok & ~mini.converged
        # rows whose result is (or reports) the IOD seed: exact f64 parity
        np.testing.assert_array_equal(
            full.iod_equinoctial[used], mini.iod_equinoctial[used]
        )
        np.testing.assert_array_equal(
            full.iod_elements[used], mini.iod_elements[used]
        )
        # converged rows: seed vectors never crossed the link
        assert np.isnan(mini.iod_equinoctial[mini.converged]).all()
        assert np.isnan(mini.iod_elements[mini.converged]).all()

    def test_parity_mixed(self, eph):
        full, mini = self._tables(eph, DifferentialCorrectionConfig())
        assert full.converged.any()  # deferred rows exist alongside converged
        self._assert_contract(full, mini)

    def test_parity_with_fallback_rows(self, eph):
        # force the LSQ stage to flag every orbit bizarre (a_max below the
        # real ~2.4 AU) so fell_back rows exercise the deferred gather
        from outfit_tpu.elements.types import EquinoctialLimits

        cfg = DifferentialCorrectionConfig(
            orbital_limits=EquinoctialLimits(max_semi_major_axis=0.5,
                                             max_apoapsis_distance=0.5)
        )
        full, mini = self._tables(eph, cfg)
        assert full.fell_back_to_iod.any()
        self._assert_contract(full, mini)

    def test_single_chunk_path(self, eph):
        """Uniform datasets skip the merged-LSQ branch; the per-chunk
        dispatch must wire the same deferred contract (incl. the gather,
        forced via bizarre limits)."""
        from outfit_tpu.elements.types import EquinoctialLimits
        from outfit_tpu.lsq.api import fit_lsq_dispatch, fit_lsq_finalize

        kep_true = KeplerianElements(*map(jnp.float64, _KEP_TRUE))
        ds = _synth_dataset(eph, kep_true, _EPOCHS)
        for cfg in (
            DifferentialCorrectionConfig(),
            DifferentialCorrectionConfig(
                orbital_limits=EquinoctialLimits(
                    max_semi_major_axis=0.5, max_apoapsis_distance=0.5
                )
            ),
        ):
            full = fit_lsq(
                _synth_dataset(eph, kep_true, _EPOCHS), eph, _IOD, cfg,
                seed=42, as_table=True,
            )
            pend = fit_lsq_dispatch(
                _synth_dataset(eph, kep_true, _EPOCHS), eph, _IOD, cfg,
                seed=42, as_table=True, minimal_fetch=True,
            )
            assert pend.minimal and not pend.st.get("lsq_merged")
            self._assert_contract(full, fit_lsq_finalize(pend))

    @pytest.mark.slow
    def test_multi_chunk_mesh_merged(self, eph, monkeypatch):
        """minimal_fetch x multi-chunk x mesh (VERDICT r2 weak #4): a
        two-width-bucket dataset on the 8-virtual-device mesh must run the
        MERGED correction (one while-loop, not one per chunk), keep the
        deferred-element contract, and agree with the single-device full
        fetch exactly."""
        import jax

        from outfit_tpu.lsq.api import fit_lsq_dispatch, fit_lsq_finalize
        from outfit_tpu.parallel import data_mesh

        def tiled():
            base = ObsDataset.from_mpc_80_col(f"{DATA}/8467.obs")
            order = np.argsort(base.mjd_tt)
            ds = ObsDataset()
            rows = []
            tids = []
            for rep in range(6):
                rows.append(order)  # full 61-obs arc
                tids.append(f"LONG{rep}")
            for rep in range(6):
                rows.append(order[:12])  # truncated 12-obs arc
                tids.append(f"SHRT{rep}")
            counts = [len(r) for r in rows]
            idx = np.concatenate(rows)
            for f in ("mjd_tt", "ra", "dec", "ra_error", "dec_error", "mag"):
                setattr(ds, f, getattr(base, f)[idx].copy())
            ds.catalog = base.catalog[idx].copy()
            ds.observer_index = base.observer_index[idx].copy()
            ds.observers = list(base.observers)
            ds.traj_index = np.repeat(np.arange(len(rows)), counts)
            ds.traj_ids = tids
            return ds

        # disable width-bucket coalescing so this small dataset genuinely
        # dispatches two chunks (production merges buckets this small)
        from outfit_tpu.iod import api as iod_api

        monkeypatch.setattr(iod_api, "_COALESCE_BUDGET", 0)

        mesh = data_mesh(jax.devices()[:8])
        cfg = DifferentialCorrectionConfig()
        pend = fit_lsq_dispatch(
            tiled(), eph, _IOD, cfg, seed=42, mesh=mesh,
            as_table=True, minimal_fetch=True,
        )
        assert len(pend.st["pending"]) > 1, "need a true multi-chunk dispatch"
        assert pend.st.get("lsq_merged"), "mesh path must use the merged LSQ"
        assert pend.minimal and pend.st.get("deferred_iod") is not None
        mini = fit_lsq_finalize(pend)

        full = fit_lsq(
            tiled(), eph, _IOD, cfg, seed=42, mesh=None, as_table=True,
        )
        assert full.converged.any()
        self._assert_contract(full, mini)

    @pytest.mark.slow
    def test_multi_chunk_per_chunk_minimal(self, eph, monkeypatch):
        """When the width padding makes the merged correction lose (budget
        0 forces it), multi-chunk dispatch runs the correction PER CHUNK —
        and minimal_fetch still composes: each chunk carries its own
        compacted deferred slice with chunk-local indices."""
        from outfit_tpu.iod import api as iod_api
        from outfit_tpu.lsq import api as lsq_api
        from outfit_tpu.lsq.api import fit_lsq_dispatch, fit_lsq_finalize

        monkeypatch.setattr(iod_api, "_COALESCE_BUDGET", 0)
        monkeypatch.setattr(lsq_api, "_LSQ_MERGE_BUDGET", 0)

        tiled = TestMinimalFetch._tiled_dataset
        cfg = DifferentialCorrectionConfig()
        pend = fit_lsq_dispatch(
            tiled(), eph, _IOD, cfg, seed=42, mesh=None,
            as_table=True, minimal_fetch=True,
        )
        assert len(pend.st["pending"]) > 1
        assert not pend.st.get("lsq_merged")
        assert pend.minimal
        assert len(pend.st["deferred_iod"]) == len(pend.st["pending"])
        mini = fit_lsq_finalize(pend)

        full = fit_lsq(
            tiled(), eph, _IOD, cfg, seed=42, mesh=None, as_table=True,
        )
        assert full.converged.any()
        self._assert_contract(full, mini)

    @staticmethod
    def _tiled_dataset():
        base = ObsDataset.from_mpc_80_col(f"{DATA}/8467.obs")
        order = np.argsort(base.mjd_tt)
        ds = ObsDataset()
        rows = [order] * 6 + [order[:12]] * 6
        tids = [f"LONG{r}" for r in range(6)] + [f"SHRT{r}" for r in range(6)]
        counts = [len(r) for r in rows]
        idx = np.concatenate(rows)
        for f in ("mjd_tt", "ra", "dec", "ra_error", "dec_error", "mag"):
            setattr(ds, f, getattr(base, f)[idx].copy())
        ds.catalog = base.catalog[idx].copy()
        ds.observer_index = base.observer_index[idx].copy()
        ds.observers = list(base.observers)
        ds.traj_index = np.repeat(np.arange(len(rows)), counts)
        ds.traj_ids = tids
        return ds

    def test_compact_cap_overflow(self, eph, monkeypatch):
        """More non-converged rows than the compact-slice cap: the overflow
        must arrive via the live gather with identical values."""
        import outfit_tpu.lsq.api as lsq_api
        from outfit_tpu.elements.types import EquinoctialLimits
        from outfit_tpu.lsq.api import fit_lsq_dispatch, fit_lsq_finalize

        # two real arcs under distinct trajectory ids, both forced to fall
        # back by bizarre limits -> 2 need rows; floor 1 -> cap 1 -> overflow
        def two_arc_ds():
            base = ObsDataset.from_mpc_80_col(f"{DATA}/8467.obs")
            ds = ObsDataset.from_mpc_80_col(f"{DATA}/8467.obs")
            obs_idx = base.trajectory_obs_indices("8467")
            for i in obs_idx:
                ds.push_observation(
                    "COPY", float(base.mjd_tt[i]), float(base.ra[i]),
                    float(base.dec[i]), float(base.ra_error[i]),
                    float(base.dec_error[i]),
                    base.get_observer(int(base.observer_index[i])),
                )
            return ds

        cfg = DifferentialCorrectionConfig(
            orbital_limits=EquinoctialLimits(
                max_semi_major_axis=0.5, max_apoapsis_distance=0.5
            )
        )
        full = fit_lsq(two_arc_ds(), eph, _IOD, cfg, seed=42, as_table=True)
        assert full.fell_back_to_iod.sum() == 2
        monkeypatch.setattr(lsq_api, "_NEED_CAP_FLOOR", 1)
        pend = fit_lsq_dispatch(
            two_arc_ds(), eph, _IOD, cfg, seed=42, as_table=True,
            minimal_fetch=True,
        )
        assert pend.minimal
        [(idx, _n, _el, _eqv)] = pend.st["need_pack"]  # one fetch chunk
        assert idx.shape[0] == 1  # cap really was 1
        self._assert_contract(full, fit_lsq_finalize(pend))

    def test_requires_table(self, eph):
        from outfit_tpu.lsq.api import fit_lsq_dispatch

        with pytest.raises(ValueError, match="as_table"):
            fit_lsq_dispatch(
                ObsDataset.from_mpc_80_col(f"{DATA}/8467.obs"), eph, _IOD,
                DifferentialCorrectionConfig(), seed=42, minimal_fetch=True,
            )

    def test_stream_minimal(self, eph):
        from outfit_tpu.lsq import fit_lsq_stream

        mixed = TestLsqTable._mixed_dataset
        full = fit_lsq(mixed(self, eph), eph, _IOD,
                       DifferentialCorrectionConfig(), seed=42, as_table=True)
        ((_, mini),) = fit_lsq_stream(
            [mixed(self, eph)], eph, _IOD, DifferentialCorrectionConfig(),
            seed=42, as_table=True, minimal_fetch=True,
        )
        self._assert_contract(full, mini)


class TestTableStatusConvention:
    def test_from_results_uses_kernel_codes(self):
        """LsqTable.from_results must store the SAME status convention as
        the device path (lsq/loop.py codes: 1=OK, 2=bizarre, 3=diverged,
        -1=never ran) — the two construction paths previously disagreed
        (advisor round-2 finding)."""
        from outfit_tpu.lsq.api import LsqResult
        from outfit_tpu.lsq.table import LsqTable

        results = {
            "CONV": LsqResult(
                "CONV", ok=True, normalised_rms=0.5, epoch=57000.0,
                equinoctial=np.ones(6), covariance=np.eye(6),
                uncertainties=np.ones(6),
            ),
            "FELL": LsqResult(
                "FELL", ok=True, error="BizarreOrbit",
                fell_back_to_iod=True, normalised_rms=1.0, epoch=57000.0,
                equinoctial=np.ones(6),
            ),
            "DIVG": LsqResult(
                "DIVG", ok=True, error="DifferentialCorrectionDiverged",
                fell_back_to_iod=True, normalised_rms=2.0, epoch=57000.0,
                equinoctial=np.ones(6),
            ),
            "DEAD": LsqResult("DEAD", ok=False, error="IOD failed: x"),
        }
        t = LsqTable.from_results(list(results), results)
        get = lambda tid: int(t.status[t.traj_ids.index(tid)])
        assert get("CONV") == 1  # STATUS_OK
        assert get("FELL") == 2  # bizarre
        assert get("DIVG") == 3  # diverged
        assert get("DEAD") == -1  # never ran


class TestPatchRow:
    def test_patch_row_clears_stale_iod_columns(self):
        """patch_row must reset the IOD columns and ``kept`` before
        refilling: a refit result without an IOD stage (r.iod is None)
        must not inherit the lean stage's iod_* values (ADVICE r4: rows
        mixing stages — iod_ok staying True with IOD_OK code and stale
        elements under a failed refit)."""
        from outfit_tpu.iod.api import FitResult
        from outfit_tpu.lsq.api import LsqResult
        from outfit_tpu.lsq.table import IOD_HOST_SCREENED, IOD_OK, LsqTable

        good = LsqResult(
            "A", ok=True, status=1, normalised_rms=1.0, epoch=57000.0,
            equinoctial=np.arange(6.0), covariance=np.eye(6),
            uncertainties=np.ones(6), n_active_obs=10,
            total_newton_iterations=3,
            iod=FitResult(
                "A", ok=True, rms=0.5, corrected=True, epoch=57000.0,
                kind=1, elements=np.arange(6.0), equinoctial=np.arange(6.0),
            ),
        )
        t = LsqTable.from_results(["A"], {"A": good})
        assert t.iod_ok[0] and t.iod_error_code[0] == IOD_OK and t.kept[0]

        t.patch_row("A", LsqResult("A", ok=False, error="refit failed"))
        assert not t.iod_ok[0]
        assert t.iod_error_code[0] == IOD_HOST_SCREENED
        assert not t.kept[0]
        assert np.isnan(t.iod_rms[0])
        assert np.isnan(t.iod_elements[0]).all()
        assert np.isnan(t.iod_equinoctial[0]).all()
        assert t.iod_kind[0] == -1
        assert not t.iod_corrected[0]
        assert not t.result("A").ok

    def test_row_lookup_is_stable_across_patch_row(self):
        """_row_index's lazy {tid: row} map relies on traj_ids being
        immutable after construction: lookups (result / patch_row /
        __contains__ of unknown ids) must stay correct after rows are
        patched, and unknown ids must raise KeyError both before and
        after the map is built."""
        from outfit_tpu.lsq.api import LsqResult
        from outfit_tpu.lsq.table import LsqTable

        results = {
            t: LsqResult(
                t, ok=True, status=1, normalised_rms=1.0,
                epoch=57000.0, equinoctial=np.full(6, float(k)),
                covariance=np.eye(6), uncertainties=np.ones(6),
                n_active_obs=8, total_newton_iterations=2,
            )
            for k, t in enumerate(["A", "B", "C"])
        }
        t = LsqTable.from_results(list(results), results)
        with pytest.raises(KeyError):
            t.result("NOPE")  # unknown id before the map exists
        assert float(t.result("C").equinoctial[0]) == 2.0
        t.patch_row("B", LsqResult("B", ok=False, error="x"))
        # lookups after patch_row: same rows, patched values
        assert not t.result("B").ok
        assert float(t.result("A").equinoctial[0]) == 0.0
        assert float(t.result("C").equinoctial[0]) == 2.0
        with pytest.raises(KeyError):
            t.patch_row("NOPE", LsqResult("NOPE", ok=False, error="x"))
