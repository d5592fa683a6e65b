"""Ephemeris generation: apparent positions and observation geometry.

Rebuilds ``src/ephemeris/`` (3.5k LoC): the request/result API
(Position / Geometry / Combined outputs, Single / Range / At epoch modes),
the apparent-position kernel with first- and second-order aberration, and
observation geometry (phase angle, solar elongation, radial velocity,
angular rates).  The compute core is batched over (observer, epoch) pairs.
"""

from outfit_tpu.ephemeris.config import AberrationOrder, EphemerisConfig  # noqa: F401
from outfit_tpu.ephemeris.request import (  # noqa: F401
    Combined,
    EphemerisMode,
    EphemerisRequest,
    Geometry,
    Position,
)
from outfit_tpu.ephemeris.result import EphemerisEntry, EphemerisResult  # noqa: F401
from outfit_tpu.ephemeris.compute import ApparentPosition, BodyGeometry  # noqa: F401
from outfit_tpu.ephemeris.api import compute_ephemeris  # noqa: F401
from outfit_tpu.ephemeris.api import compute_ephemerides_for_results  # noqa: F401
from outfit_tpu.ephemeris.batch import (  # noqa: F401
    EphemerisTable,
    compute_ephemerides_batch,
)
