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

def _build_jit_for(ephem, cache_velocity: bool):
    """Compile-cached jitted cache-build compute, stored ON the ephemeris
    object so its lifetime (and the closed-over compiled executables') is
    tied to the ephemeris, not the process — a module-level dict keyed by
    id(ephem) would leak every ephemeris ever used."""
    store = getattr(ephem, "_observer_cache_jit", None)
    if store is None:
        store = {}
        try:
            ephem._observer_cache_jit = store
        except AttributeError:
            pass  # exotic immutable ephem: fall through, re-jit per build
    return store


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
        """Build from an ObsDataset + ephemeris.  Parity: OutfitCache::build.

        The device compute (GMST/nutation/rotpn chain + ephemeris lookup for
        every observation) runs as ONE jitted call on power-of-two padded
        shapes — eager per-primitive dispatch cost dominated host prep at
        survey scale otherwise.  UT1 table interpolation stays host-side.
        """
        import jax

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

        n = len(dataset.mjd_tt)
        nb = 8
        while nb < n:
            nb *= 2
        pad = nb - n
        mjd_np = np.concatenate([dataset.mjd_tt, np.full(pad, dataset.mjd_tt[0])])
        tut = ut1.tt_mjd_to_ut1(mjd_np)
        fp = np.concatenate([fixed_pos[oi], np.zeros((pad, 3))])
        fv = np.concatenate([fixed_vel[oi], np.zeros((pad, 3))])

        store = _build_jit_for(ephem, cache_velocity)
        key = bool(cache_velocity)
        fn = store.get(key)
        if fn is None:
            def _compute(mjd, tut, fp, fv):
                from outfit_tpu.frames import equequ
                from outfit_tpu.time import gmst

                g = gmst(tut) + equequ(mjd)
                geo_pos, geo_vel = pvobs(mjd, fp, fv, g)
                if not cache_velocity:
                    geo_vel = jnp.zeros_like(geo_vel)
                hp = helio_position(ephem, mjd, geo_pos)
                hv = helio_velocity(ephem, mjd, geo_vel)
                return geo_pos, geo_vel, hp, hv

            fn = store[key] = jax.jit(_compute)

        geo_pos, geo_vel, hp, hv = fn(
            jnp.asarray(mjd_np), jnp.asarray(tut), jnp.asarray(fp), jnp.asarray(fv)
        )
        s = slice(0, n)
        return cls(
            jnp.asarray(dataset.mjd_tt), geo_pos[s], geo_vel[s], hp[s], hv[s]
        )
