"""Propagator dispatch: two-body or N-body with state transition matrix.

Rebuilds ``src/propagator/`` — ``PropagatorKind`` (mod.rs:27-64),
``NBodyConfig`` (mod.rs:132-162), the DOP853+STM integrator (nbody.rs),
and the DE440 GM table (re-exported from outfit_tpu.ephem.bodies).
"""

from outfit_tpu.propagator.config import NBodyConfig, PropagatorKind  # noqa: F401
from outfit_tpu.propagator.nbody import propagate_nbody  # noqa: F401
from outfit_tpu.propagator.dop853 import dop853_integrate  # noqa: F401
