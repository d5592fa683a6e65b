"""Universal-variable Kepler kernels (batched, masked, jit/vmap-ready).

Rebuilds the reference's ``src/kepler/`` (5.3k LoC of scalar Rust) as
fixed-trip, branch-free JAX kernels: Stumpff functions, preliminary universal
anomaly guesses, the safeguarded Newton solver with bracketing fallback,
two-body propagation, and the Lagrange f-g velocity correction.
"""

from outfit_tpu.kepler.stumpff import s_funct  # noqa: F401
from outfit_tpu.kepler.universal import (  # noqa: F401
    KeplerParams,
    SolverConfig,
    prelim_kepuni,
    solve_kepuni,
    propagate_universal,
    velocity_correction,
)
from outfit_tpu.kepler.angles import principal_angle, angle_diff  # noqa: F401
