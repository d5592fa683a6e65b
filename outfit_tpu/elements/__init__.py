"""Orbital element representations, conversions, Jacobians, covariance.

Rebuilds the reference's ``src/orbit_type/`` and ``src/orb_elem.rs``.
"""

from outfit_tpu.elements.orb_elem import (  # noqa: F401
    eccentricity_control,
    ccek1,
)
from outfit_tpu.elements.types import (  # noqa: F401
    KeplerianElements,
    EquinoctialElements,
    CometaryElements,
    EquinoctialLimits,
    is_bizarre,
    keplerian_to_equinoctial,
    equinoctial_to_keplerian,
    cometary_to_keplerian,
    cometary_to_equinoctial,
    jacobian_keplerian_to_equinoctial,
    jacobian_equinoctial_to_keplerian,
    jacobian_cometary_to_keplerian,
    jacobian_cometary_to_equinoctial,
)
from outfit_tpu.elements.twobody import (  # noqa: F401
    propagate_twobody,
    solve_generalized_kepler,
    TwoBodyResult,
)
from outfit_tpu.elements.uncertainty import (  # noqa: F401
    propagate_covariance,
    uncertainties_from_covariance,
)
