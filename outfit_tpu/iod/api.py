"""User-facing IOD API: fit_full_iod over a whole dataset.

Behavioral parity with the reference's ``FitIOD`` trait
(``src/initial_orbit_determination/obs_dataset_api.rs``) and
``estimate_best_orbit`` (``trajectory.rs:429-545``):

* prepare: error model -> batch RMS correction -> observer cache
  (``prepare_iod`` :254-275),
* per-trajectory deterministic noise (the reference XORs a base seed with a
  stable trajectory hash, :277-296; here: jax.random fold_in with a
  CRC32 of the trajectory id — same contract: results independent of
  trajectory order and parallel schedule),
* triplets x (1 + n_noise_realizations) Monte-Carlo lanes, Gauss candidates,
  RMS scoring over the triplet window, best-orbit argmin.

TPU-first: every trajectory's lanes are flattened into ONE device batch; a
single jitted kernel processes all trajectories of a dataset at once.  The
lane batch is the axis to shard across chips (outfit_tpu.parallel).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from outfit_tpu.constants import ROT_EQUMJ2000_TO_ECLMJ2000
from outfit_tpu.errors import NoFeasibleTriplets, NoViableOrbit
from outfit_tpu.elements.orb_elem import KIND_KEPLERIAN, ccek1
from outfit_tpu.elements.types import (
    CometaryElements,
    EquinoctialElements,
    KeplerianElements,
    cometary_to_equinoctial,
    keplerian_to_equinoctial,
)
from outfit_tpu.iod.gauss import (
    GaussTriplets,
    candidates_to_elements,
    gauss_candidates,
    polish_selected,
)
from outfit_tpu.iod.params import IODParams
from outfit_tpu.iod.scoring import rms_orbit_error
from outfit_tpu.iod.triplets import generate_triplet_indices_batch
from outfit_tpu.observations.error_model import ErrorModel
from outfit_tpu.observer.cache import ObserverCache
from outfit_tpu.time.scales import Ut1Provider
from outfit_tpu.utils.linalg import rotate3


@dataclass
class FitResult:
    """Per-trajectory IOD outcome (parity: FitOrbitResult::IODGauss)."""

    traj_id: str
    ok: bool
    error: Optional[str] = None
    rms: float = float("inf")
    corrected: bool = False
    epoch: float = 0.0
    kind: int = KIND_KEPLERIAN  # 0 = Keplerian, 1 = Cometary (ccek1 output)
    elements: Optional[np.ndarray] = None  # (6,) ccek1 element set
    equinoctial: Optional[np.ndarray] = None  # (6,) a,h,k,p,q,lambda (ecliptic)

    @property
    def orbit_quality(self) -> float:
        """Scalar fit quality = the windowed IOD RMS.  Parity:
        ``FitOrbitResult::orbit_quality`` (constants.rs:157-162)."""
        return self.rms

    @property
    def orbital_elements(self):
        """ccek1 element set (Keplerian or Cometary per ``kind``); parity:
        ``FitOrbitResult::orbital_elements`` (constants.rs:169-174)."""
        if self.elements is None:
            return None
        e = self.elements
        if self.kind == KIND_KEPLERIAN:
            return KeplerianElements(self.epoch, e[0], e[1], e[2], e[3], e[4], e[5])
        from outfit_tpu.elements.types import CometaryElements

        return CometaryElements(self.epoch, e[0], e[1], e[2], e[3], e[4], e[5])

    @property
    def keplerian(self) -> Optional[KeplerianElements]:
        if self.elements is None or self.kind != KIND_KEPLERIAN:
            return None
        e = self.elements
        return KeplerianElements(self.epoch, e[0], e[1], e[2], e[3], e[4], e[5])


def _bucket(n: int, floor: int = 8) -> int:
    """Round up to the next power of two (>= floor): ragged trajectories
    land in a handful of padded shapes instead of recompiling per dataset
    (SURVEY hard-part #3 bucketing policy)."""
    b = floor
    while b < n:
        b *= 2
    return b


def stable_hash(traj_id: str) -> int:
    """Order-stable trajectory hash (determinism contract,
    obs_dataset_api.rs:277-296)."""
    return zlib.crc32(traj_id.encode("utf-8"))


@dataclass
class PaddedDatasetArrays:
    """(T, n_max) per-trajectory padded views of a whole dataset, built with
    one lexsort + vectorized scatters (no per-trajectory Python loops — the
    host-prep bottleneck at survey scale, docs/DESIGN.md)."""

    counts: np.ndarray  # (T,) observations per trajectory
    n_max: int  # bucketed padded width
    mjd: np.ndarray  # (T, n_max) epoch-sorted
    ra: np.ndarray
    dec: np.ndarray
    sra: np.ndarray  # padded slots = 1.0 (benign weights)
    sdec: np.ndarray
    helio: np.ndarray  # (T, n_max, 3)
    valid: np.ndarray  # (T, n_max) bool
    glob_idx: np.ndarray  # (T, n_max) global observation index per slot
    bias_ra: Optional[np.ndarray] = None  # (T, n_max) debiasing, radians
    bias_dec: Optional[np.ndarray] = None


def padded_dataset_arrays(dataset, helio: np.ndarray) -> PaddedDatasetArrays:
    """Build the padded per-trajectory layout for every trajectory, in
    ``traj_ids`` order.  ``helio`` is the observer-cache heliocentric
    position table aligned with dataset storage order."""
    n = len(dataset.mjd_tt)
    Tall = dataset.n_trajectories
    order = np.lexsort((dataset.mjd_tt, dataset.traj_index))
    ti_sorted = dataset.traj_index[order]
    counts = np.bincount(ti_sorted, minlength=Tall)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(n) - starts[ti_sorted]
    n_max = _bucket(int(counts.max(initial=1)))

    def _scatter(src, fill=0.0):
        out = np.full((Tall, n_max), fill)
        out[ti_sorted, pos] = src[order]
        return out

    helio_pad = np.zeros((Tall, n_max, 3))
    helio_pad[ti_sorted, pos] = helio[order]
    valid = np.zeros((Tall, n_max), dtype=bool)
    valid[ti_sorted, pos] = True
    glob_idx = np.zeros((Tall, n_max), np.int64)
    glob_idx[ti_sorted, pos] = order
    return PaddedDatasetArrays(
        counts=counts,
        n_max=n_max,
        mjd=_scatter(dataset.mjd_tt),
        ra=_scatter(dataset.ra),
        dec=_scatter(dataset.dec),
        sra=_scatter(dataset.ra_error, fill=1.0),
        sdec=_scatter(dataset.dec_error, fill=1.0),
        helio=helio_pad,
        valid=valid,
        glob_idx=glob_idx,
        bias_ra=None if dataset.bias_ra is None else _scatter(dataset.bias_ra),
        bias_dec=None if dataset.bias_dec is None else _scatter(dataset.bias_dec),
    )


def _draw_noise(base_key, hashes, max_triplets, n_real):
    return jax.vmap(
        lambda h: jax.random.normal(
            jax.random.fold_in(base_key, h), (max_triplets, n_real, 3, 2)
        )
    )(hashes)


_draw_noise_jit = jax.jit(_draw_noise, static_argnames=("max_triplets", "n_real"))


def _lane_select(rms, valid, corrected):
    """Per-lane candidate choice: corrected-preferred, then min RMS.

    Parity: ``prelim_orbit`` corrected-first policy (gauss.rs:1238-1247)
    with min-RMS tie-breaking instead of solver discovery order.
    """
    finite = jnp.isfinite(rms)
    corr_ok = corrected & valid & finite
    any_corr = jnp.any(corr_ok, axis=-1, keepdims=True)
    eligible = jnp.where(any_corr, corr_ok, valid & finite)
    score = jnp.where(eligible, rms, jnp.inf)
    best = jnp.argmin(score, axis=-1)
    best_rms = jnp.take_along_axis(score, best[..., None], axis=-1)[..., 0]
    return best, best_rms


def _to_equinoctial(kind, el, epoch):
    """Element-set-aware equinoctial conversion (Keplerian or hyperbolic
    Cometary), masked per lane."""
    kep = KeplerianElements(
        epoch, el[..., 0], el[..., 1], el[..., 2], el[..., 3], el[..., 4], el[..., 5]
    )
    eq_from_kep = keplerian_to_equinoctial(kep)
    com = CometaryElements(
        epoch, el[..., 0], el[..., 1], el[..., 2], el[..., 3], el[..., 4], el[..., 5]
    )
    eq_from_com = cometary_to_equinoctial(com)
    is_kep = kind == KIND_KEPLERIAN
    return EquinoctialElements(
        epoch,
        *[
            jnp.where(is_kep, a, jnp.where(jnp.isfinite(b), b, 0.0))
            for a, b in zip(eq_from_kep[1:], eq_from_com[1:])
        ],
    )


def _iod_kernel(tri: GaussTriplets, obs_arrays, lane_traj, window_mask, params: IODParams):
    """Jitted core: candidates -> elements -> scores -> per-lane best.

    ``params.precision == "mixed"`` runs root-finding, the f-g correction
    loop, and RMS scoring in f32 (native-rate on TPU, ~8x the emulated-f64
    ALU throughput), selects the winner, then recovers f64 accuracy for that
    single candidate per lane via :func:`polish_selected` + an f64 rescore.
    Times (MJD epochs) stay f64 throughout — only day-scale differences are
    cast down (f32 cannot hold an absolute MJD to better than ~6 minutes).
    """
    mixed = params.precision == "mixed"
    cands = gauss_candidates(
        tri, params, work_dtype=jnp.float32 if mixed else None
    )
    state_elems = candidates_to_elements(cands)

    kind = state_elems.kind  # (L, K)
    el = state_elems.elements  # (L, K, 6)
    eq = _to_equinoctial(kind, el, cands.epoch)

    mjd, ra, dec, sra, sdec, helio = obs_arrays
    if mixed:
        ra, dec, sra, sdec, helio = (
            x.astype(jnp.float32) for x in (ra, dec, sra, sdec, helio)
        )
    obs_mjd = mjd[lane_traj][:, None, :]  # (L, 1, N)
    obs_ra = ra[lane_traj][:, None, :]
    obs_dec = dec[lane_traj][:, None, :]
    obs_sra = sra[lane_traj][:, None, :]
    obs_sdec = sdec[lane_traj][:, None, :]
    obs_helio = helio[lane_traj][:, None, :, :]
    wmask = window_mask[:, None, :]

    rms = rms_orbit_error(
        eq, obs_mjd, obs_ra, obs_dec, obs_sra, obs_sdec, obs_helio, wmask
    )  # (L, K)

    best_cand, best_rms = _lane_select(rms, cands.valid, cands.corrected)

    take = lambda x: jnp.take_along_axis(
        x, best_cand.reshape(best_cand.shape + (1,) * (x.ndim - 1)), axis=1
    )[:, 0]

    # --- per-TRAJECTORY winner (segment argmin over the ragged lane axis) ---
    # the caller only ever uses the best lane per trajectory, so the f64
    # polish/rescore and the device->host transfer run on T lanes, not T*K
    L = best_rms.shape[0]
    T = mjd.shape[0]
    seg_min = jnp.full(T, jnp.inf, best_rms.dtype).at[lane_traj].min(
        best_rms, mode="drop"
    )
    finite = jnp.isfinite(best_rms)
    is_best = finite & (best_rms <= seg_min[lane_traj])
    lane_ids = jnp.arange(L, dtype=jnp.int32)
    sel = (
        jnp.full(T, L, jnp.int32)
        .at[lane_traj]
        .min(jnp.where(is_best, lane_ids, L), mode="drop")
    )
    has = sel < L  # trajectory produced at least one finite-scored lane
    sel = jnp.minimum(sel, L - 1)

    gather = lambda x: take(x)[sel]
    rms_t = jnp.where(has, seg_min.astype(jnp.float64), jnp.inf)

    if not mixed:
        return (
            rms_t,
            gather(kind),
            gather(el),
            gather(eq.vector),
            gather(cands.epoch),
            gather(cands.corrected) & has,
        )

    # --- f64 polish + rescore of the single winning lane per trajectory -----
    tri_t = GaussTriplets(*(f[sel] for f in tri))
    ppos, pvel, pepoch, pcorr = polish_selected(
        tri_t,
        gather(cands.r2),
        gather(cands.pos),
        gather(cands.vel),
        gather(cands.epoch),
        gather(cands.corrected),
        gather(cands.chi1),
        gather(cands.chi2),
        params,
        params.polish_max_it,
    )
    rot = jnp.asarray(ROT_EQUMJ2000_TO_ECLMJ2000)
    kind64, el64 = ccek1(
        rotate3(rot, ppos[..., 1, :]),
        rotate3(rot, pvel),
    )
    eq64 = _to_equinoctial(kind64, el64, pepoch)
    mjd64, ra64, dec64, sra64, sdec64, helio64 = obs_arrays
    rms64 = rms_orbit_error(
        eq64, mjd64, ra64, dec64, sra64, sdec64, helio64, window_mask[sel]
    )
    best64 = jnp.where(has & jnp.isfinite(rms_t), rms64, jnp.inf)
    return (best64, kind64, el64, eq64.vector, pepoch, pcorr & has)


_iod_kernel_jit = jax.jit(_iod_kernel, static_argnames=("params",))


def fit_full_iod(
    dataset,
    ephem,
    params: IODParams = IODParams(),
    seed: int = 0,
    ut1: Optional[Ut1Provider] = None,
    error_model: Optional[ErrorModel] = None,
    cache: Optional[ObserverCache] = None,
    mesh="auto",
) -> Dict[str, FitResult]:
    """Batch IOD over every trajectory of the dataset.

    Parity: ``fit_full_iod`` (obs_dataset_api.rs:145-172); the rayon
    parallel variant is subsumed — all trajectories run as one device batch,
    and per-trajectory deterministic seeding keeps results schedule-
    independent (the reference's bitwise sequential==parallel contract).

    ``mesh="auto"`` (default) shards the lane batch over a 1-D data mesh of
    all local devices when more than one is present — the multi-chip path IS
    the public entry point (the reference ships ``fit_full_iod_parallel`` as
    a user API, obs_dataset_api.rs:174-207).  Pass ``mesh=None`` to force
    single-device, or an explicit ``jax.sharding.Mesh``.
    """
    from outfit_tpu.parallel import resolve_mesh

    mesh = resolve_mesh(mesh)
    params = params.validated()
    if error_model is not None:
        dataset.apply_error_model(error_model)
        dataset.apply_batch_rms_correction(params.gap_max)
    if np.isnan(dataset.ra_error).any():
        dataset.apply_error_model(ErrorModel.fcct14())
        dataset.apply_batch_rms_correction(params.gap_max)
    if cache is None:
        cache = ObserverCache.build(dataset, ephem, ut1)

    helio = np.asarray(cache.helio_pos_equ)

    results: Dict[str, FitResult] = {}
    n_real = params.n_noise_realizations + 1
    base_key = jax.random.PRNGKey(seed)

    # --- vectorized padded layout: one lexsort + scatters for the WHOLE
    # dataset (per-trajectory Python loops dominated host prep at survey
    # scale: ~0.35 ms/trajectory, docs/DESIGN.md) --------------------------
    Tall = dataset.n_trajectories
    if len(dataset.mjd_tt) == 0 or Tall == 0:
        for tid in dataset.traj_ids:
            results[tid] = FitResult(
                tid, ok=False,
                error=str(
                    NoFeasibleTriplets(
                        0.0, 0, params.dt_min, params.dt_max_triplet
                    )
                ),
            )
        return results
    lay = padded_dataset_arrays(dataset, helio)
    counts_all = lay.counts
    n_max = lay.n_max
    epochs_pad = lay.mjd
    obs_ra_all = lay.ra
    obs_dec_all = lay.dec
    obs_sra_all = lay.sra
    obs_sdec_all = lay.sdec
    obs_helio_all = lay.helio
    obs_valid_all = lay.valid
    glob_idx = lay.glob_idx

    trips_all, ktrips_all = generate_triplet_indices_batch(
        epochs_pad,
        counts_all,
        params.dt_min,
        params.dt_max_triplet,
        params.optimal_interval_time,
        params.max_obs_for_triplets,
        params.max_triplets,
    )

    # trajectories observed from an unresolvable station are errors, not
    # silently-geocentric fits (photom fails loudly; observatories.py)
    unk = np.fromiter(
        (o.unknown for o in dataset.observers), bool, count=len(dataset.observers)
    )
    bad_traj = np.zeros(Tall, bool)
    if unk.any():
        bad_obs = unk[dataset.observer_index]
        bad_traj = np.bincount(
            dataset.traj_index[bad_obs], minlength=Tall
        ).astype(bool)
        for t in np.nonzero(bad_traj)[0]:
            tid = dataset.traj_ids[t]
            sel = dataset.traj_index == t
            codes = sorted(
                {
                    dataset.observers[i].code or "?"
                    for i in np.unique(dataset.observer_index[sel & bad_obs])
                }
            )
            results[tid] = FitResult(
                tid, ok=False, error=f"UnknownObservatory({', '.join(codes)})"
            )
        ktrips_all = np.where(bad_traj, 0, ktrips_all)

    arc = np.where(
        counts_all > 0,
        epochs_pad[np.arange(Tall), np.maximum(counts_all - 1, 0)]
        - epochs_pad[:, 0],
        0.0,
    )
    for t in np.nonzero((ktrips_all == 0) & ~bad_traj)[0]:
        tid = dataset.traj_ids[t]
        results[tid] = FitResult(
            tid,
            ok=False,
            error=str(
                NoFeasibleTriplets(
                    arc[t],
                    int(counts_all[t]),
                    params.dt_min,
                    params.dt_max_triplet,
                )
            ),
        )
    kept_rows = np.nonzero(ktrips_all > 0)[0]
    if kept_rows.size == 0:
        return results
    kept_tids = [dataset.traj_ids[t] for t in kept_rows]

    # one batched draw for every trajectory's Monte-Carlo noise: per-tid key,
    # FIXED shape (max_triplets, n_real, 3, 2) — deterministic, independent
    # of dataset composition, batch split, AND of the realized triplet count
    # (the first K_t rows are used).  Parity contract: obs_dataset_api.rs
    # :277-296 (base seed ^ stable trajectory hash).  Jitted with the hash
    # count bucketed: eager dispatch costs ~25 ms/op through the axon
    # tunnel, and per-hash fold_in keys make padding value-transparent.
    hashes_np = np.fromiter(
        (stable_hash(t) for t in kept_tids), np.uint32, count=len(kept_tids)
    )
    hb = _bucket(len(hashes_np))
    hashes = jnp.asarray(np.pad(hashes_np, (0, hb - len(hashes_np))))
    z_all = np.asarray(
        _draw_noise_jit(base_key, hashes, params.max_triplets, n_real)
    )[: len(kept_tids)].copy()
    z_all[:, :, 0, :, :] = 0.0  # realization 0 = exact triplet

    # --- vectorized lane assembly: (trajectory x triplet x realization) ----
    Tk = kept_rows.size
    K_t = ktrips_all[kept_rows]  # (Tk,) realized triplet counts
    S = int(K_t.sum())
    tk_t = np.repeat(np.arange(Tk), K_t)  # (S,) kept-row per flat triplet
    tk_off = np.concatenate([[0], np.cumsum(K_t)[:-1]])
    tk_k = np.arange(S) - tk_off[tk_t]  # triplet rank within its trajectory
    rows_k = kept_rows[tk_t]  # (S,) dataset trajectory row
    tr_flat = trips_all[rows_k, tk_k]  # (S, 3) local observation indices
    g_flat = glob_idx[rows_k[:, None], tr_flat]  # (S, 3) global indices
    z_flat = z_all[tk_t, tk_k]  # (S, n_real, 3, 2)
    ns = params.noise_scale
    # (S, n_real, 3) lanes, flattened row-major (triplet-major per
    # trajectory) — the same lane order as the scalar loop produced
    ra_l = dataset.ra[g_flat][:, None, :] + z_flat[..., 0] * dataset.ra_error[g_flat][:, None, :] * ns
    dec_l = dataset.dec[g_flat][:, None, :] + z_flat[..., 1] * dataset.dec_error[g_flat][:, None, :] * ns
    L = S * n_real
    lane_ra = ra_l.reshape(L, 3)
    lane_dec = dec_l.reshape(L, 3)
    lane_t = np.broadcast_to(
        dataset.mjd_tt[g_flat][:, None, :], (S, n_real, 3)
    ).reshape(L, 3)
    lane_pos = np.broadcast_to(
        helio[g_flat][:, None, :, :], (S, n_real, 3, 3)
    ).reshape(L, 3, 3)
    lane_traj_np = np.repeat(tk_t, n_real)

    # RMS window (select_rms_interval, trajectory.rs:294-350) batched over
    # flat triplets: with sorted epochs and dt >= 0 the searchsorted index
    # window equals the epoch-interval mask (triplet endpoints included)
    te1 = epochs_pad[rows_k, tr_flat[:, 0]]
    te3 = epochs_pad[rows_k, tr_flat[:, 2]]
    if params.extf >= 0.0:
        dt = (te3 - te1) * params.extf
    else:
        dt = 10.0 * arc[rows_k]
    if params.dtmax >= 0.0:
        dt = np.maximum(dt, params.dtmax)
    ep_k = epochs_pad[rows_k]  # (S, n_max)
    wmask_tr = (
        (ep_k >= (te1 - dt)[:, None])
        & (ep_k <= (te3 + dt)[:, None])
        & obs_valid_all[rows_k]
    )
    window_mask = np.repeat(wmask_tr, n_real, axis=0)  # (L, n_max)
    T = Tk

    # --- trajectory-aligned device batches (IODParams.batch_size, mod.rs:
    # 169-171) + shape bucketing: lanes and trajectories are padded to
    # powers of two so different datasets (and different chunks) reuse the
    # same compiled kernel.  Lanes are contiguous per trajectory and
    # trajectory-major, so every chunk is a SLICE (no isin scans).
    lane_counts = (K_t * n_real).astype(np.int64)
    lane_off = np.concatenate([[0], np.cumsum(lane_counts)])  # (Tk+1,)
    if params.batch_size > 0:
        bounds = [0]
        while bounds[-1] < Tk:
            s = bounds[-1]
            e = (
                int(
                    np.searchsorted(
                        lane_off, lane_off[s] + params.batch_size, side="right"
                    )
                )
                - 1
            )
            bounds.append(max(e, s + 1))
        spans = list(zip(bounds[:-1], bounds[1:]))
    else:
        spans = [(0, Tk)]

    best_rms = np.full(T, np.inf)
    kind = np.zeros(T, np.int32)
    el = np.zeros((T, 6))
    eqv = np.zeros((T, 6))
    epoch = np.zeros(T)
    corrected = np.zeros(T, bool)

    pending = []  # dispatch everything first: chunk N+1's host prep and
    # transfers overlap chunk N's device execution (async dispatch)
    for t0g, t1g in spans:
        sl = slice(int(lane_off[t0g]), int(lane_off[t1g]))
        g_traj = lane_traj_np[sl] - t0g
        Tg = t1g - t0g

        # pad lanes to a bucket with inert rows (window all-False -> inf
        # score -> excluded from the segment argmin); padded trajectory
        # rows have no valid observations
        Lg = sl.stop - sl.start
        Lb = _bucket(Lg)
        if mesh is not None and Lb % mesh.devices.size:
            from outfit_tpu.parallel import pad_to_multiple

            Lb = pad_to_multiple(Lb, mesh.devices.size)
        Tb = _bucket(Tg + (1 if Lb > Lg else 0))

        def lane_pad(x):
            return np.concatenate(
                [x[sl], np.repeat(x[sl][:1], Lb - Lg, axis=0)]
            )

        g_window = np.concatenate(
            [window_mask[sl], np.zeros((Lb - Lg, n_max), bool)]
        )
        g_lane_traj = np.concatenate([g_traj, np.full(Lb - Lg, Tg, np.int64)])

        g_rows = kept_rows[t0g:t1g]

        def traj_pad(x):
            shape = (Tb - Tg,) + x.shape[1:]
            return np.concatenate([x[g_rows], np.zeros(shape, x.dtype)])

        tri = GaussTriplets(
            jnp.asarray(lane_pad(lane_ra)),
            jnp.asarray(lane_pad(lane_dec)),
            jnp.asarray(lane_pad(lane_t)),
            jnp.asarray(lane_pad(lane_pos)),
        )
        g_obs = tuple(
            jnp.asarray(traj_pad(x))
            for x in (
                epochs_pad,
                obs_ra_all,
                obs_dec_all,
                obs_sra_all,
                obs_sdec_all,
                obs_helio_all,
            )
        )
        g_lane_traj = jnp.asarray(g_lane_traj)
        g_window = jnp.asarray(g_window)
        if mesh is not None:
            # lanes sharded over the data axis; per-trajectory observation
            # tables replicated (small, and the lane->trajectory gather
            # stays shard-local)
            from outfit_tpu.parallel import replicate, shard_batch

            tri = shard_batch(mesh, tri)
            g_lane_traj = shard_batch(mesh, g_lane_traj)
            g_window = shard_batch(mesh, g_window)
            g_obs = replicate(mesh, g_obs)
        out = _iod_kernel_jit(tri, g_obs, g_lane_traj, g_window, params)
        pending.append((t0g, t1g, Tg, out))

    for t0g, t1g, Tg, out in pending:
        g_rms, g_kind, g_el, g_eqv, g_epoch, g_corr = (np.asarray(o) for o in out)
        best_rms[t0g:t1g] = g_rms[:Tg]
        kind[t0g:t1g] = g_kind[:Tg]
        el[t0g:t1g] = g_el[:Tg]
        eqv[t0g:t1g] = g_eqv[:Tg]
        epoch[t0g:t1g] = g_epoch[:Tg]
        corrected[t0g:t1g] = g_corr[:Tg]

    # kernel outputs are per-trajectory (the segment argmin runs on device)
    for t_row, tid in enumerate(kept_tids):
        if not np.isfinite(best_rms[t_row]):
            results[tid] = FitResult(
                tid, ok=False,
                error=str(NoViableOrbit(int(lane_counts[t_row]))),
            )
            continue
        results[tid] = FitResult(
            tid,
            ok=True,
            rms=float(best_rms[t_row]),
            corrected=bool(corrected[t_row]),
            epoch=float(epoch[t_row]),
            kind=int(kind[t_row]),
            elements=el[t_row],
            equinoctial=eqv[t_row],
        )
    return results


def fit_iod(
    observations,
    ephem,
    params: IODParams = IODParams(),
    seed: int = 0,
    ut1=None,
    traj_id: str = "TRAJ",
) -> FitResult:
    """Single-trajectory IOD from a list of Observation records.

    Parity: ``FitIOD::fit_iod`` (obs_dataset_api.rs:41-127) — convenience
    wrapper around the batched path for one trajectory.
    """
    from outfit_tpu.observations.dataset import ObsDataset

    ds = ObsDataset()
    for o in observations:
        ds.push_observation(
            traj_id, o.mjd_tt, o.ra, o.dec, o.ra_error, o.dec_error, o.observer
        )
    return fit_full_iod(ds, ephem, params, seed=seed, ut1=ut1)[traj_id]
