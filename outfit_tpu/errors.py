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


class BrentDekkerKeplerConvergence(OutfitError):
    """Bracketing Kepler fallback failed (outfit_errors.rs ~:200)."""


class GaussPrelimOrbitFailed(OutfitError):
    """No preliminary Gauss orbit could be formed for a triplet."""


class InvalidErrorModel(OutfitError):
    """Unknown astrometric error-model name."""


class InvalidErrorModelFilePath(OutfitError):
    """Error-model data file missing or unreadable."""


class InvalidFloatValue(OutfitError):
    """Non-finite or unparsable floating-point field."""


class InvalidIODParameter(OutfitError):
    """IODParams validation failure (mirrors the builder errors)."""


class InvalidJPLEphemFileVersion(OutfitError):
    """Ephemeris binary has an unsupported DE version / layout."""


class InvalidJPLStringFormat(OutfitError):
    """Ephemeris source string is not 'scheme:NAME'."""


class InvalidSpkDataType(OutfitError):
    """DAF/SPK segment data type is not Type 2 / Type 3."""


class JPLFileNotFound(OutfitError, FileNotFoundError):
    """Resolved ephemeris path does not exist (no-network build)."""


class NoTrajectoryIndex(OutfitError):
    """Dataset has no trajectory index for the requested operation."""


class NoiseInjectionError(OutfitError):
    """Monte-Carlo noise generation failed."""


class ObsDatasetError(OutfitError):
    """Generic observation-dataset construction/ingestion failure."""


class ObserverIdIsNone(OutfitError):
    """Observation carries no resolvable observer."""


class RmsComputationFailed(OutfitError):
    """RMS scoring produced no usable value for a trajectory."""


class RootFindingError(OutfitError):
    """Generic scalar root-finder failure."""


class TrajectoryIdNotFound(OutfitError):
    """Requested trajectory id is not present in the dataset."""


class VelocityCorrectionError(OutfitError):
    """Lagrange f-g velocity correction failed (velocity.rs:94-209)."""
