"""Greenwich Mean Sidereal Time (IAU 1982).

Parity: ``src/time.rs:326-361``.  Pure jittable function of MJD(UT1),
vectorized over any leading shape.
"""

import jax.numpy as jnp

from outfit_tpu.constants import DPI, T2000, SIDEREAL_RATIO

# GMST at 0h UT1 polynomial coefficients (seconds)
_C0 = 24110.54841
_C1 = 8640184.812866
_C2 = 9.3104e-2
_C3 = -6.2e-6


def gmst(tjm_ut1):
    """GMST in radians, normalized to [0, 2pi), for MJD (UT1)."""
    tjm = jnp.asarray(tjm_ut1)
    itjm = jnp.floor(tjm)
    t = (itjm - T2000) / 36525.0
    gmst0 = (((_C3 * t + _C2) * t + _C1) * t + _C0) * (DPI / 86400.0)
    h = (tjm - itjm) * DPI
    g = gmst0 + h * SIDEREAL_RATIO
    return g - jnp.floor(g / DPI) * DPI
