"""outfit_tpu — TPU-native, batch-first orbit determination and propagation.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the Rust crate
``FusRoman/Outfit`` (reference: /root/reference, see SURVEY.md): Gauss initial
orbit determination, differential orbit correction (weighted least squares with
chi-squared outlier rejection), universal-variable two-body and DOP853 N-body
propagation with state-transition matrices, JPL ephemerides, IAU-1980 Earth
orientation, and apparent-position/ephemeris generation.

Design posture (differs radically from the reference's scalar Rust):
  * every kernel is batched (leading batch axes) and jit/vmap/pjit-ready,
  * control flow is fixed-trip masked iteration instead of early exit,
  * errors are data (status codes / NaN masks), not exceptions, inside kernels,
  * host-side Python handles parsing and I/O; device-side JAX handles math.

f64 note: the reference's numerical contracts (1e-9..1e-11 oracles) require
double precision, so importing this package enables ``jax_enable_x64``.
"""

from jax import config as _jax_config

_jax_config.update("jax_enable_x64", True)
# TPU matmuls on f32 inputs default to bf16 mantissa passes; the mixed-
# precision IOD path needs true-f32 contractions (they are 3x3 einsums —
# full precision is free) or the rho solve loses ~5 digits.
_jax_config.update("jax_default_matmul_precision", "highest")

from outfit_tpu import constants  # noqa: E402,F401
from outfit_tpu.constants import (  # noqa: E402,F401
    GAUSS_GRAV,
    GAUSS_GRAV_SQUARED,
    VLIGHT_AU,
    T2000,
)

__version__ = "0.1.0"
