"""Per-dataset precomputed observer state arrays.

Parity: ``src/cache/`` — ``OutfitCache::build`` (mod.rs:144-166) builds,
once per dataset, the per-observer body-fixed cache and the per-observation
geocentric/heliocentric states; accessors are O(1) by observation index
(mod.rs:183-210).  Here the cache IS the TPU representation: dense
``[n_obs, 3]`` float64 arrays (SURVEY 2.9 "TPU equivalent").
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from outfit_tpu.observer.geometry import (
    earth_fixed_position,
    earth_fixed_velocity,
    gast,
    helio_position,
    helio_velocity,
    pvobs,
)
from outfit_tpu.time.scales import Ut1Provider


class ObserverCache(NamedTuple):
    """Dense per-observation observer states.

    geocentric states in ecliptic J2000; heliocentric in equatorial J2000
    (matching the reference's frames, observer_centric_cache.rs:45-91).
    """

    mjd_tt: jnp.ndarray  # (n,)
    geo_pos_ecl: jnp.ndarray  # (n, 3) AU
    geo_vel_ecl: jnp.ndarray  # (n, 3) AU/day
    helio_pos_equ: jnp.ndarray  # (n, 3) AU
    helio_vel_equ: jnp.ndarray  # (n, 3) AU/day

    @classmethod
    def build(cls, dataset, ephem, ut1: Ut1Provider = None, cache_velocity: bool = True):
        """Build from an ObsDataset + ephemeris.  Parity: OutfitCache::build."""
        if ut1 is None:
            ut1 = Ut1Provider()
        if len(dataset.observers) == 0:  # empty dataset
            z = jnp.zeros((0, 3))
            return cls(jnp.zeros(0), z, z, z, z)
        # per-observer fixed vectors, gathered per observation
        fixed_pos = np.stack(
            [np.asarray(earth_fixed_position(o)) for o in dataset.observers]
        )
        fixed_vel = np.stack(
            [np.asarray(earth_fixed_velocity(o)) for o in dataset.observers]
        )
        oi = np.asarray(dataset.observer_index)
        obs_fixed_pos = jnp.asarray(fixed_pos[oi])
        obs_fixed_vel = jnp.asarray(fixed_vel[oi])

        mjd = jnp.asarray(dataset.mjd_tt)
        g = gast(dataset.mjd_tt, ut1)
        geo_pos, geo_vel = pvobs(mjd, obs_fixed_pos, obs_fixed_vel, g)
        if not cache_velocity:
            geo_vel = jnp.zeros_like(geo_vel)
        hp = helio_position(ephem, mjd, geo_pos)
        hv = helio_velocity(ephem, mjd, geo_vel)
        return cls(mjd, geo_pos, geo_vel, hp, hv)
