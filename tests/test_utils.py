"""Unrolled linear algebra utilities."""

import numpy as np
import jax.numpy as jnp

from outfit_tpu.utils.linalg import cholesky6, cholesky_inverse6


def test_cholesky_inverse_vs_numpy():
    rng = np.random.default_rng(0)
    g = rng.normal(size=(32, 10, 6))
    a = jnp.asarray(np.einsum("bnj,bnk->bjk", g, g) + 1e-6 * np.eye(6))
    inv, ok = cholesky_inverse6(a)
    assert bool(ok.all())
    np.testing.assert_allclose(np.asarray(inv), np.linalg.inv(np.asarray(a)), rtol=1e-8, atol=1e-10)


def test_cholesky_factor():
    rng = np.random.default_rng(1)
    g = rng.normal(size=(6, 6))
    a = jnp.asarray(g @ g.T + 6 * np.eye(6))
    L, ok = cholesky6(a)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(a), atol=1e-12)


def test_non_spd_flagged():
    a = jnp.asarray(-np.eye(6))
    _, ok = cholesky_inverse6(a)
    assert not bool(ok)


def test_singular_flagged():
    a = np.eye(6)
    a[3, 3] = 0.0
    _, ok = cholesky_inverse6(jnp.asarray(a))
    assert not bool(ok)


class TestConfigSerde:
    """Serde-feature analogue round trips (Cargo.toml:67,81: the reference's
    optional serde derives on the solver-parameter structs)."""

    def test_iod_params_roundtrip(self):
        import json

        from outfit_tpu.iod.params import IODParams

        p = IODParams(n_noise_realizations=7, precision="mixed", max_triplets=5)
        d = json.loads(json.dumps(p.to_dict()))
        assert IODParams.from_dict(d) == p

    def test_diffcor_config_roundtrip(self):
        import json

        from outfit_tpu.lsq.config import DifferentialCorrectionConfig
        from outfit_tpu.propagator.config import NBodyConfig, PropagatorKind

        cfg = DifferentialCorrectionConfig(
            max_newton_iterations=12,
            free_elements=(True, True, False, True, True, True),
            propagator=PropagatorKind(nbody=True, config=NBodyConfig.with_planets()),
            precision="mixed",
        )
        d = json.loads(json.dumps(cfg.to_dict()))
        assert DifferentialCorrectionConfig.from_dict(d) == cfg


class TestTopLevelFacade:
    def test_reference_facade_names_resolve(self):
        """Every symbol of the reference's curated pub-use facade
        (src/lib.rs:326-434) resolves from the top-level package."""
        import outfit_tpu as ot

        names = """
        KeplerianElements EquinoctialElements CometaryElements OrbitalElements
        OutfitError GaussResult IODParams FullOrbitResult IODRMS
        AU GAUSS_GRAV RADEG RADH RADSEC SECONDS_PER_DAY T2000 VLIGHT_AU
        JPLEphem AberrationOrder ApparentPosition BodyGeometry EphemerisConfig
        EphemerisEntry EphemerisMode EphemerisRequest EphemerisResult
        FullOrbitResultExt ObserverRequest
        fit_full_iod fit_full_iod_parallel fit_iod fit_lsq
        DifferentialCorrectionConfig DifferentialCorrectionOutput
        ObsDataset ErrorModel Observer Ut1Provider
        """.split()
        missing = [n for n in names if not hasattr(ot, n)]
        assert not missing, missing
        # __dir__ lists the facade
        assert "fit_full_iod" in dir(ot)
        # unknown names still raise
        import pytest as _pytest

        with _pytest.raises(AttributeError):
            ot.no_such_symbol
