"""Differential orbit correction (weighted least squares), batched.

Rebuilds ``src/differential_orbit_correction/`` (3.1k LoC): per-observation
partials, normal-equation solves, projection-based chi-squared outlier
rejection, the nested Newton / rejection loops, and the ``fit_lsq`` API —
as trajectory-batched masked kernels (one device batch fits every
trajectory of a dataset simultaneously).
"""

from outfit_tpu.lsq.config import DifferentialCorrectionConfig, OutlierRejectionConfig  # noqa: F401
from outfit_tpu.lsq.table import LsqTable  # noqa: F401
from outfit_tpu.lsq.api import (  # noqa: F401
    LsqResult,
    PendingLsq,
    fit_lsq,
    fit_lsq_dispatch,
    fit_lsq_escalating,
    fit_lsq_finalize,
    fit_lsq_stream,
    fit_lsq_stream_escalating,
)
