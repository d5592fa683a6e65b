"""Observer geometry: body-fixed, geocentric, and heliocentric states.

Rebuilds ``src/observer_extension.rs`` and ``src/cache/`` as batched
functions + a precomputed per-dataset cache of observer state arrays.
"""

from outfit_tpu.observer.geometry import (  # noqa: F401
    earth_fixed_position,
    earth_fixed_velocity,
    pvobs,
    helio_position,
    helio_velocity,
)
from outfit_tpu.observer.cache import ObserverCache  # noqa: F401
