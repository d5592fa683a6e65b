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
