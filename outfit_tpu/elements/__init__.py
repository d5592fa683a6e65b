"""Orbital element representations, conversions, Jacobians, covariance.

Rebuilds the reference's ``src/orbit_type/`` and ``src/orb_elem.rs``.
"""

from outfit_tpu.elements.orb_elem import (  # noqa: F401
    eccentricity_control,
    ccek1,
)
