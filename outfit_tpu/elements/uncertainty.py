"""Covariance propagation and 1-sigma uncertainties.

Parity: ``src/orbit_type/uncertainty.rs`` — ``OrbitalCovariance.propagate``
(Sigma' = J Sigma J^T, :412) and per-representation ``from_covariance``
(diagonal square roots, :244-278).  Batched: covariance (..., 6, 6).
"""

import jax.numpy as jnp


def propagate_covariance(covariance, jacobian):
    """Sigma' = J Sigma J^T for batched (..., 6, 6) inputs."""
    return jacobian @ covariance @ jnp.swapaxes(jacobian, -1, -2)


def uncertainties_from_covariance(covariance):
    """Per-element 1-sigma values: sqrt of the covariance diagonal (..., 6)."""
    diag = jnp.diagonal(covariance, axis1=-2, axis2=-1)
    return jnp.sqrt(jnp.maximum(diag, 0.0))
