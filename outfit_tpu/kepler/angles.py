"""Angle helpers.  Parity: ``src/kepler/angles.rs:15,24``."""

import jax.numpy as jnp

from outfit_tpu.constants import DPI


def principal_angle(angle):
    """Wrap an angle to [0, 2pi)."""
    a = jnp.asarray(angle)
    return a - jnp.floor(a / DPI) * DPI


def angle_diff(a, b):
    """Principal difference b - a wrapped to (-pi, pi]."""
    d = principal_angle(jnp.asarray(b) - jnp.asarray(a))
    return jnp.where(d > jnp.pi, d - DPI, d)
