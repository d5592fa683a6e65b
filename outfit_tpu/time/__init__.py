"""Time scales and sidereal time.

Rebuilds the surface of the reference's ``src/time.rs`` (which delegates scale
conversions to the ``hifitime`` crate): MJD/JD conversions, UTC<->TT with the
IERS leap-second table, calendar parsing/formatting, and the IAU-1982 GMST
polynomial (``src/time.rs:326-361``).

All scale conversions are vectorized numpy/jax-compatible functions; calendar
string handling is host-side Python.
"""

from outfit_tpu.time.scales import (  # noqa: F401
    tai_minus_utc,
    utc_mjd_to_tt,
    tt_mjd_to_utc,
    mjd_to_jd,
    jd_to_mjd,
    utc_jd_to_tt_mjd,
    date_to_mjd,
    frac_date_to_mjd,
    iso_tt_from_mjd,
    iso_utc_from_mjd_tt,
    Ut1Provider,
)
from outfit_tpu.time.sidereal import gmst  # noqa: F401
