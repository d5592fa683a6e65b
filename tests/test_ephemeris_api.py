"""Ephemeris generation API: closure vs synthesis, geometry physics.

Mirrors the reference's test strategy (``tests/test_ephemeris.rs``): fit /
synthesize an orbit, then exercise output-kind x mode combinations and check
predicted vs observed positions within tight angular thresholds.
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
from outfit_tpu.ephemeris import (
    AberrationOrder,
    EphemerisConfig,
    EphemerisMode,
    EphemerisRequest,
    compute_ephemeris,
)
from outfit_tpu.iod.scoring import apparent_radec
from outfit_tpu.observations.dataset import ObsDataset
from outfit_tpu.observations.observatories import Observer, get_observatory

DATA = os.path.join(os.path.dirname(__file__), "data")
from outfit_tpu.propagator.config import NBodyConfig, PropagatorKind


@pytest.fixture(scope="module")
def eph():
    return JPLEphem.analytic(56900.0, 57400.0)


@pytest.fixture(scope="module")
def kep():
    return KeplerianElements(
        *map(jnp.float64, (57000.0, 2.3, 0.15, 0.12, 1.1, 0.7, 0.3))
    )


class TestApparentPosition:
    @pytest.mark.slow
    def test_matches_synthesis_geocentric(self, eph, kep):
        """Ephemeris RA/Dec at epoch == the synthesis used for IOD closure."""
        eq = keplerian_to_equinoctial(kep)
        epochs = np.array([57005.0, 57020.0, 57100.0])
        st = propagate_twobody(
            EquinoctialElements(*[jnp.broadcast_to(f, epochs.shape) for f in eq]),
            57000.0, jnp.asarray(epochs), compute_derivatives=False,
        )
        rot = jnp.asarray(ROT_ECLMJ2000_TO_EQUMJ2000)
        earth, _ = eph.earth_ephemeris(jnp.asarray(epochs))
        ra_ref, dec_ref = apparent_radec(
            jnp.einsum("ij,...j->...i", rot, st.position),
            jnp.einsum("ij,...j->...i", rot, st.velocity),
            earth,
        )
        req = EphemerisRequest().add(Observer.geocenter(), EphemerisMode.at(epochs))
        res = compute_ephemeris(kep, req, eph)
        assert res.success_count() == 3
        for i, e in enumerate(res):
            assert e.value.position.ra == pytest.approx(float(ra_ref[i]), abs=1e-12)
            assert e.value.position.dec == pytest.approx(float(dec_ref[i]), abs=1e-12)
            assert 1.0 < e.value.position.heliocentric_distance < 3.0

    @pytest.mark.slow
    def test_ground_station_parallax(self, eph, kep):
        """Topocentric vs geocentric positions differ by the diurnal
        parallax, bounded by ~ Earth radius / distance."""
        req = (
            EphemerisRequest()
            .add(Observer.geocenter(), EphemerisMode.single(57020.0))
            .add(get_observatory("G96"), EphemerisMode.single(57020.0))
        )
        res = compute_ephemeris(kep, req, eph)
        assert res.success_count() == 2
        e0, e1 = res.entries
        dra = abs(e0.value.position.ra - e1.value.position.ra)
        ddec = abs(e0.value.position.dec - e1.value.position.dec)
        max_parallax = 4.3e-5 / e0.value.position.geocentric_distance  # rad
        assert 0 < max(dra, ddec) < 1.5 * max_parallax

    @pytest.mark.slow
    def test_modes(self, eph, kep):
        req = (
            EphemerisRequest()
            .add(Observer.geocenter(), EphemerisMode.single(57010.0))
            .add(Observer.geocenter(), EphemerisMode.range(57010.0, 57020.0, 5.0))
        )
        res = compute_ephemeris(kep, req, eph)
        assert len(res) == 4  # 1 + 3
        assert res.success_count() == 4
        # range mode starts where single mode is: identical first entry
        assert res.entries[0].value.position.ra == res.entries[1].value.position.ra

    def test_hyperbolic_short_circuit(self, eph):
        com_like = EquinoctialElements(
            jnp.float64(57000.0), jnp.float64(2.0), jnp.float64(1.2),
            jnp.float64(0.3), jnp.float64(0.0), jnp.float64(0.0), jnp.float64(1.0),
        )  # e ~ 1.24
        req = EphemerisRequest().add(Observer.geocenter(), EphemerisMode.at([57010.0, 57020.0]))
        res = compute_ephemeris(com_like, req, eph)
        assert res.error_count() == 2
        assert all("InvalidOrbit" in e.error for e in res.errors())


class TestAberration:
    def test_orders_agree_to_second_order(self, eph, kep):
        req1 = EphemerisRequest(EphemerisConfig(aberration=AberrationOrder.FIRST))
        req1.add(Observer.geocenter(), EphemerisMode.single(57020.0))
        req2 = EphemerisRequest(EphemerisConfig(aberration=AberrationOrder.SECOND))
        req2.add(Observer.geocenter(), EphemerisMode.single(57020.0))
        r1 = compute_ephemeris(kep, req1, eph).entries[0]
        r2 = compute_ephemeris(kep, req2, eph).entries[0]
        diff = abs(r1.value.position.ra - r2.value.position.ra)
        # first vs second order differ at O((v/c)^2 * rho) ~ sub-mas
        assert diff < 0.05 * RADSEC
        assert diff > 0  # but they are not identical


class TestGeometry:
    def test_physical_ranges(self, eph, kep):
        req = EphemerisRequest().add(
            get_observatory("F51"), EphemerisMode.range(57000.0, 57300.0, 25.0)
        )
        res = compute_ephemeris(kep, req, eph)
        for e in res.successes():
            g = e.value.geometry
            assert 0.0 <= g.phase_angle <= np.pi
            assert 0.0 <= g.solar_elongation <= np.pi
            assert abs(g.radial_velocity) < 0.03  # AU/day
            assert abs(g.d_ra_dt) < 0.2 and abs(g.d_dec_dt) < 0.2

    def test_angular_rates_match_finite_difference(self, eph, kep):
        dt = 0.01
        req = EphemerisRequest().add(
            Observer.geocenter(), EphemerisMode.at([57020.0 - dt, 57020.0, 57020.0 + dt])
        )
        res = compute_ephemeris(kep, req, eph)
        e = [x.value for x in res.entries]
        fd_ra = (e[2].position.ra - e[0].position.ra) / (2 * dt)
        fd_dec = (e[2].position.dec - e[0].position.dec) / (2 * dt)
        # rates are geometric (no aberration chain); allow ~1% agreement
        assert e[1].geometry.d_ra_dt == pytest.approx(fd_ra, rel=2e-2, abs=1e-6)
        assert e[1].geometry.d_dec_dt == pytest.approx(fd_dec, rel=2e-2, abs=1e-6)

    def test_radial_velocity_matches_distance_derivative(self, eph, kep):
        dt = 0.01
        req = EphemerisRequest().add(
            Observer.geocenter(), EphemerisMode.at([57020.0 - dt, 57020.0, 57020.0 + dt])
        )
        res = compute_ephemeris(kep, req, eph)
        e = [x.value for x in res.entries]
        fd = (e[2].position.geocentric_distance - e[0].position.geocentric_distance) / (2 * dt)
        assert e[1].geometry.radial_velocity == pytest.approx(fd, rel=2e-2, abs=1e-8)


class TestNBodyEphemeris:
    def test_nbody_close_to_twobody_short_arc(self, eph, kep):
        cfg = EphemerisConfig(
            propagator=PropagatorKind.n_body(NBodyConfig.with_planets())
        )
        req_nb = EphemerisRequest(cfg).add(Observer.geocenter(), EphemerisMode.single(57020.0))
        req_tb = EphemerisRequest().add(Observer.geocenter(), EphemerisMode.single(57020.0))
        r_nb = compute_ephemeris(kep, req_nb, eph).entries[0]
        r_tb = compute_ephemeris(kep, req_tb, eph).entries[0]
        assert r_nb.ok and r_tb.ok
        diff = abs(r_nb.value.position.ra - r_tb.value.position.ra)
        assert diff < 10.0 * RADSEC  # 20-day planetary perturbation is small
        assert diff > 0


@pytest.mark.slow
def test_fit_predict_closure_2015ab_per_site():
    """Mirror of tests/test_ephemeris.rs:438-466: fit the merged K09R05F
    trajectory, predict apparent positions at every observation epoch from
    each observation's own site, and require the median separation from the
    actual astrometry below the reference's 2.0 arcsec threshold (measured
    here: ~0.6 arcsec median)."""
    from outfit_tpu.iod import IODParams
    from outfit_tpu.lsq import DifferentialCorrectionConfig, fit_lsq
    from outfit_tpu.observations.error_model import ErrorModel

    ds = ObsDataset.from_mpc_80_col(f"{DATA}/2015AB.obs")
    eph = JPLEphem("analytic:builtin")
    res = fit_lsq(
        ds, eph,
        iod_params=IODParams(precision="mixed"),
        config=DifferentialCorrectionConfig(
            precision="mixed", divergence_grace_iterations=2
        ),
        seed=42, error_model=ErrorModel.fcct14(),
    )
    r = res["K09R05F"]
    assert r.ok and not r.fell_back_to_iod
    idx = ds.trajectory_obs_indices("K09R05F")
    req = EphemerisRequest()
    for i in idx:
        req.add(
            ds.observers[ds.observer_index[i]],
            EphemerisMode.at([float(ds.mjd_tt[i])]),
        )
    out = compute_ephemeris(r.keplerian, req, eph)
    seps = []
    for e, i in zip(out.entries, idx):
        assert e.error is None, e.error
        p = e.value.position
        dra = (p.ra - ds.ra[i] + np.pi) % (2 * np.pi) - np.pi
        seps.append(
            np.hypot(dra * np.cos(ds.dec[i]), p.dec - ds.dec[i]) * 206264.806
        )
    assert np.median(seps) < 2.0


class TestOutputKinds:
    """Output-kind markers (parity: the reference's sealed
    ``EphemerisOutputKind`` Position/Geometry/Combined type parameters,
    request.rs:91-141): the marker selects what the entry value carries."""

    def test_position_only(self, eph, kep):
        from outfit_tpu.ephemeris.compute import ApparentPosition
        from outfit_tpu.ephemeris.request import Position

        req = EphemerisRequest(output=Position).add(
            Observer.geocenter(), EphemerisMode.single(57020.0)
        )
        res = compute_ephemeris(kep, req, eph)
        v = res.entries[0].value
        assert isinstance(v, ApparentPosition)
        assert not hasattr(v, "geometry")

    def test_geometry_only(self, eph, kep):
        from outfit_tpu.ephemeris.compute import BodyGeometry
        from outfit_tpu.ephemeris.request import Geometry

        req = EphemerisRequest(output=Geometry).add(
            Observer.geocenter(), EphemerisMode.single(57020.0)
        )
        res = compute_ephemeris(kep, req, eph)
        v = res.entries[0].value
        assert isinstance(v, BodyGeometry)
        assert 0.0 <= v.phase_angle <= np.pi

    def test_combined_default_matches_parts(self, eph, kep):
        from outfit_tpu.ephemeris.request import Combined, Geometry, Position

        mk = lambda kind: compute_ephemeris(
            kep,
            EphemerisRequest(output=kind).add(
                Observer.geocenter(), EphemerisMode.single(57020.0)
            ),
            eph,
        ).entries[0].value
        comb = mk(Combined)
        assert comb.position == mk(Position)
        assert comb.geometry == mk(Geometry)
        # default request is Combined
        assert EphemerisRequest().output == Combined

    def test_invalid_kind_rejected(self):
        with pytest.raises(ValueError):
            EphemerisRequest(output="both")


class TestUnknownObservatory:
    """Unknown MPC codes carry geocenter placeholder coordinates; every
    consumer must surface an error, never a silent geocentric prediction
    (same contract as the fit pipelines' per-trajectory UnknownObservatory)."""

    def test_unknown_observer_entries_error(self, eph, kep):
        bad = get_observatory("ZZ9")
        assert bad.unknown
        req = (
            EphemerisRequest()
            .add(Observer.geocenter(), EphemerisMode.at([57010.0]))
            .add(bad, EphemerisMode.at([57010.0, 57020.0]))
        )
        res = compute_ephemeris(kep, req, eph)
        assert len(res.entries) == 3
        good, b1, b2 = res.entries
        assert good.ok and good.value is not None
        for e in (b1, b2):
            assert not e.ok and "UnknownObservatory" in e.error

    def test_all_unknown_still_structured(self, eph, kep):
        bad = get_observatory("ZZ8")
        req = EphemerisRequest().add(bad, EphemerisMode.at([57010.0]))
        res = compute_ephemeris(kep, req, eph)
        assert res.error_count() == 1 and not res.entries[0].ok


class TestBatchEphemerides:
    """compute_ephemerides_batch: ONE-dispatch bulk generation must
    reproduce the per-orbit API exactly (batch.rs:73 parity through the
    columnar fast path), including failed-fit rows, non-elliptic orbits,
    and unknown-observatory columns."""

    def _results(self, eph):
        from outfit_tpu.lsq.api import LsqResult

        rng = np.random.default_rng(8)
        out = {}
        for k in range(3):
            eqv = np.array([
                2.0 + 0.3 * k, 0.05 * k, 0.1, 0.01, 0.02 * k, 1.0 + k,
            ])
            out[f"T{k}"] = LsqResult(
                f"T{k}", ok=True, epoch=57000.0 + k, equinoctial=eqv,
                normalised_rms=1.0, status=1,
            )
        out["BAD"] = LsqResult("BAD", ok=False, error="NoViableOrbit(8)")
        out["HYP"] = LsqResult(
            "HYP", ok=True, epoch=57000.0,
            equinoctial=np.array([2.0, 1.2, 0.3, 0.0, 0.0, 0.0]),  # e>1
            normalised_rms=1.0, status=1,
        )
        return out

    def _request(self):
        return EphemerisRequest().add(
            Observer.geocenter(), EphemerisMode.range(57010.0, 57040.0, 10.0)
        ).add(
            get_observatory("809"), EphemerisMode.at([57015.0, 57025.0])
        )

    def test_matches_per_orbit_api(self, eph):
        from outfit_tpu.ephemeris import (
            compute_ephemerides_batch,
            compute_ephemerides_for_results,
        )

        results = self._results(eph)
        req = self._request()
        per_orbit = compute_ephemerides_for_results(results, req, eph)
        table = compute_ephemerides_batch(results, req, eph)

        assert set(table.traj_ids) == set(results)
        assert table.n_pairs == len(req)
        for tid in results:
            ref = per_orbit[tid]
            got = table.result(tid)
            assert len(got) == len(ref)
            for a, b in zip(ref, got):
                assert a.epoch == b.epoch
                assert a.ok == b.ok, (tid, a.epoch, a.error, b.error)
                if not a.ok:
                    assert a.error == b.error
                    continue
                av = a.value
                bv = b.value
                for f in ("ra", "dec", "geocentric_distance",
                          "heliocentric_distance"):
                    np.testing.assert_allclose(
                        getattr(bv.position, f), getattr(av.position, f),
                        rtol=1e-13, atol=1e-13, err_msg=f"{tid}:{f}",
                    )
                for f in ("phase_angle", "solar_elongation",
                          "radial_velocity", "d_ra_dt", "d_dec_dt"):
                    np.testing.assert_allclose(
                        getattr(bv.geometry, f), getattr(av.geometry, f),
                        rtol=1e-12, atol=1e-13, err_msg=f"{tid}:{f}",
                    )

    def test_error_rows_and_columns(self, eph):
        from outfit_tpu.ephemeris import compute_ephemerides_batch

        results = self._results(eph)
        req = self._request()
        table = compute_ephemerides_batch(results, req, eph)
        i_bad = table.traj_ids.index("BAD")
        i_hyp = table.traj_ids.index("HYP")
        assert not table.ok[i_bad].any()
        assert not table.ok[i_hyp].any()
        assert "fit failed" in table.row_errors["BAD"]
        assert "InvalidOrbit" in table.row_errors["HYP"]
        # good rows are fully ok (geocenter + a known site, elliptic)
        i0 = table.traj_ids.index("T0")
        assert table.ok[i0].all()

    def test_unknown_observatory_columns(self, eph):
        from outfit_tpu.ephemeris import compute_ephemerides_batch
        import dataclasses

        unknown_obs = dataclasses.replace(
            Observer.geocenter(), code="Z99", unknown=True
        )
        req = EphemerisRequest().add(
            Observer.geocenter(), EphemerisMode.at([57010.0])
        ).add(unknown_obs, EphemerisMode.at([57010.0]))
        table = compute_ephemerides_batch(self._results(eph), req, eph)
        i0 = table.traj_ids.index("T0")
        assert table.ok[i0, 0] and not table.ok[i0, 1]
        entries = list(table.result("T0"))
        assert entries[1].error == "UnknownObservatory(Z99)"

    def test_lsq_table_columnar_input(self, eph):
        from outfit_tpu.ephemeris import compute_ephemerides_batch
        from outfit_tpu.lsq.table import LsqTable

        results = self._results(eph)
        lt = LsqTable.from_results(list(results), results)
        req = self._request()
        t_dict = compute_ephemerides_batch(results, req, eph)
        t_tab = compute_ephemerides_batch(lt, req, eph)
        assert t_tab.traj_ids == list(results)
        np.testing.assert_array_equal(t_tab.ok, t_dict.ok)
        np.testing.assert_array_equal(t_tab.ra, t_dict.ra)

    def test_raw_elements_accepts_lists_and_tuples(self, eph):
        """A raw-elements entry is any 2-sequence (epoch, eq_vector):
        zip()/JSON pipelines produce lists, and a tuple-only check used
        to silently misclassify those as failed fits."""
        from outfit_tpu.ephemeris import compute_ephemerides_batch

        eqv = np.array([2.0, 0.05, 0.1, 0.01, 0.0, 1.0])
        req = self._request()
        t_tup = compute_ephemerides_batch({"A": (57000.0, eqv)}, req, eph)
        t_list = compute_ephemerides_batch({"A": [57000.0, eqv]}, req, eph)
        assert t_list.row_errors == {} == t_tup.row_errors
        np.testing.assert_array_equal(t_list.ok, t_tup.ok)
        np.testing.assert_array_equal(t_list.ra, t_tup.ra)

    def test_unrecognized_entry_raises(self, eph):
        """Neither an LsqResult-like object nor a 2-sequence must raise
        loudly instead of yielding a silent all-error row."""
        from outfit_tpu.ephemeris import compute_ephemerides_batch

        with pytest.raises(TypeError, match="raw-elements entry"):
            compute_ephemerides_batch(
                {"A": (57000.0, np.zeros(6), "extra")}, self._request(), eph
            )
        with pytest.raises(TypeError, match="LsqResult-like"):
            compute_ephemerides_batch({"A": 57000.0}, self._request(), eph)

    def test_all_failed_batch_skips_device_work(self):
        """An all-failed-fit batch yields error rows with ZERO device
        dispatches — pinned by passing ephem=None, which any observer-
        state or orbit evaluation would immediately trip over."""
        from outfit_tpu.ephemeris import (
            compute_ephemerides_batch,
            compute_ephemerides_for_results,
        )
        from outfit_tpu.lsq.api import LsqResult

        results = {
            "A": LsqResult("A", ok=False, error="NoViableOrbit(3)"),
            "B": LsqResult("B", ok=False, error="NoFeasibleTriplets"),
        }
        req = self._request()
        table = compute_ephemerides_batch(results, req, None)
        assert set(table.row_errors) == {"A", "B"}
        assert table.ok.shape == (2, len(req))
        assert not table.ok.any()
        entries = list(table.result("A"))
        assert len(entries) == len(req)
        assert all("fit failed" in e.error for e in entries)

        per_orbit = compute_ephemerides_for_results(results, req, None)
        assert set(per_orbit) == {"A", "B"}
        assert all(
            "fit failed" in e.error for e in per_orbit["B"]
        )

    def test_to_dataframe(self, eph):
        pd = pytest.importorskip("pandas")
        from outfit_tpu.ephemeris import compute_ephemerides_batch

        table = compute_ephemerides_batch(
            self._results(eph), self._request(), eph
        )
        df = table.to_dataframe()
        assert len(df) == len(table) * table.n_pairs
        assert {"traj_id", "epoch", "observer", "ok", "ra",
                "phase_angle"} <= set(df.columns)
