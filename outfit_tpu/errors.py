"""Error taxonomy.

Parity: ``OutfitError`` (``src/outfit_errors.rs:145-296``), a single enum of
~46 variants.  The TPU-native design splits the taxonomy by layer:

* **inside batched kernels** errors are DATA — integer status codes and
  validity masks (``kepler.universal.STATUS_*``, ``lsq.loop.STATUS_*``,
  candidate masks in ``iod.gauss``) so lanes fail independently without
  aborting the batch (the reference stores ``Err`` values per trajectory,
  ``obs_dataset_api.rs:66-68``; masks are the vectorized equivalent);
* **at the host API boundary** errors are exceptions (this module) or
  structured error strings on per-trajectory results
  (``FitResult.error`` / ``LsqResult.error`` / ``EphemerisEntry.error``).

The variant names below mirror the reference's for findability.
"""


class OutfitError(Exception):
    """Base class for host-side errors."""


class InvalidRefSystem(OutfitError):
    pass


class SingularDirectionMatrix(OutfitError):
    pass


class PolynomialRootFindingFailed(OutfitError):
    pass


class SpuriousRootDetected(OutfitError):
    pass


class GaussNoRootsFound(OutfitError):
    pass


class NoViableOrbit(OutfitError):
    def __init__(self, cause, attempts):
        super().__init__(f"no viable orbit after {attempts} attempts: {cause}")
        self.cause = cause
        self.attempts = attempts


class NoFeasibleTriplets(OutfitError):
    def __init__(self, span, n_obs, dt_min, dt_max):
        super().__init__(
            f"no feasible triplets (span={span}, n_obs={n_obs}, "
            f"dt_min={dt_min}, dt_max={dt_max})"
        )


class BizarreOrbit(OutfitError):
    pass


class DifferentialCorrectionDiverged(OutfitError):
    pass


class DifferentialCorrectionFailed(OutfitError):
    pass


class NewtonRaphsonKeplerConvergence(OutfitError):
    pass


class NBodyPropagationFailed(OutfitError):
    pass


class DegenerateState(OutfitError):
    pass


class InvalidOrbit(OutfitError):
    pass


class InvalidConversion(OutfitError):
    pass


class EphemerisBodyNotSupported(OutfitError):
    pass


class InvalidJPLEphemFileSource(OutfitError):
    pass


class ObservationNotFound(OutfitError):
    pass


class NonFiniteScore(OutfitError):
    pass
