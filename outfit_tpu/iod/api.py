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
from outfit_tpu.iod.triplets import (
    generate_triplet_indices,
    select_rms_interval_batch,
)
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
) -> Dict[str, FitResult]:
    """Batch IOD over every trajectory of the dataset.

    Parity: ``fit_full_iod`` (obs_dataset_api.rs:145-172); the rayon
    parallel variant is subsumed — all trajectories run as one device batch,
    and per-trajectory deterministic seeding keeps results schedule-
    independent (the reference's bitwise sequential==parallel contract).
    """
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
    lane_ra, lane_dec, lane_t, lane_pos = [], [], [], []
    lane_traj = []
    win_lo, win_hi = [], []
    traj_rows = []  # (tid, obs_indices)

    n_real = params.n_noise_realizations + 1
    base_key = jax.random.PRNGKey(seed)

    # triplet enumeration per trajectory (vectorized numpy inside)
    kept_tids = []
    kept = []  # (tid, idx, trips (K, 3) local indices)
    for tid, idx in dataset.trajectory_groups():
        epochs = dataset.mjd_tt[idx]
        trips = generate_triplet_indices(
            epochs,
            params.dt_min,
            params.dt_max_triplet,
            params.optimal_interval_time,
            params.max_obs_for_triplets,
            params.max_triplets,
        )
        if not trips:
            span = float(epochs[-1] - epochs[0]) if len(epochs) else 0.0
            results[tid] = FitResult(
                tid,
                ok=False,
                error=f"NoFeasibleTriplets(span={span:.3f}, n_obs={len(idx)}, "
                f"dt_min={params.dt_min}, dt_max={params.dt_max_triplet})",
            )
            continue
        kept.append((tid, idx, np.asarray(trips, np.int64)))
        kept_tids.append(tid)

    if not kept:
        return results

    # one batched draw for every trajectory's Monte-Carlo noise: per-tid key,
    # FIXED shape (max_triplets, n_real, 3, 2) — deterministic, independent
    # of dataset composition, batch split, AND of the realized triplet count
    # (the first K_t rows are used).  Parity contract: obs_dataset_api.rs
    # :277-296 (base seed ^ stable trajectory hash).
    hashes = jnp.asarray([stable_hash(t) for t in kept_tids], jnp.uint32)
    z_all = np.array(
        jax.vmap(
            lambda h: jax.random.normal(
                jax.random.fold_in(base_key, h),
                (params.max_triplets, n_real, 3, 2),
            )
        )(hashes)
    )
    z_all[:, :, 0, :, :] = 0.0  # realization 0 = exact triplet

    for t_row, (tid, idx, tr) in enumerate(kept):
        epochs = dataset.mjd_tt[idx]
        K = tr.shape[0]
        g = idx[tr]  # (K, 3) global observation indices
        z = z_all[t_row, :K]  # (K, n_real, 3, 2)
        ns = params.noise_scale
        # (K, n_real, 3) lanes, flattened row-major (triplet-major) — the
        # same lane order as the scalar loop produced
        ra_l = dataset.ra[g][:, None, :] + z[..., 0] * dataset.ra_error[g][:, None, :] * ns
        dec_l = dataset.dec[g][:, None, :] + z[..., 1] * dataset.dec_error[g][:, None, :] * ns
        t_l = np.broadcast_to(dataset.mjd_tt[g][:, None, :], (K, n_real, 3))
        pos_l = np.broadcast_to(helio[g][:, None, :, :], (K, n_real, 3, 3))
        lane_ra.append(ra_l.reshape(K * n_real, 3))
        lane_dec.append(dec_l.reshape(K * n_real, 3))
        lane_t.append(t_l.reshape(K * n_real, 3))
        lane_pos.append(pos_l.reshape(K * n_real, 3, 3))
        lane_traj.append(np.full(K * n_real, t_row, np.int64))
        w0, w1 = select_rms_interval_batch(
            epochs, tr[:, 0], tr[:, 2], params.extf, params.dtmax
        )
        win_lo.append(np.repeat(w0, n_real))
        win_hi.append(np.repeat(w1, n_real))
        traj_rows.append((tid, idx))

    n_max = max(len(idx) for _, idx in traj_rows)
    n_max = _bucket(n_max)  # stable padded shapes -> compilation-cache hits
    T = len(traj_rows)
    obs_mjd = np.zeros((T, n_max))
    obs_ra = np.zeros((T, n_max))
    obs_dec = np.zeros((T, n_max))
    obs_sra = np.ones((T, n_max))
    obs_sdec = np.ones((T, n_max))
    obs_helio = np.zeros((T, n_max, 3))
    obs_valid = np.zeros((T, n_max), dtype=bool)
    for t_row, (_, idx) in enumerate(traj_rows):
        n = len(idx)
        obs_mjd[t_row, :n] = dataset.mjd_tt[idx]
        obs_ra[t_row, :n] = dataset.ra[idx]
        obs_dec[t_row, :n] = dataset.dec[idx]
        obs_sra[t_row, :n] = dataset.ra_error[idx]
        obs_sdec[t_row, :n] = dataset.dec_error[idx]
        obs_helio[t_row, :n] = helio[idx]
        obs_valid[t_row, :n] = True

    lane_ra = np.concatenate(lane_ra)
    lane_dec = np.concatenate(lane_dec)
    lane_t = np.concatenate(lane_t)
    lane_pos = np.concatenate(lane_pos)
    lane_traj_np = np.concatenate(lane_traj)
    w_lo = np.concatenate(win_lo)
    w_hi = np.concatenate(win_hi)
    L = lane_ra.shape[0]
    col = np.arange(n_max)
    window_mask = (col >= w_lo[:, None]) & (col <= w_hi[:, None])

    # --- trajectory-aligned device batches (IODParams.batch_size, mod.rs:
    # 169-171) + shape bucketing: lanes and trajectories are padded to
    # powers of two so different datasets (and different chunks) reuse the
    # same compiled kernel
    if params.batch_size > 0:
        groups = []
        cur, cur_lanes = [], 0
        counts = np.bincount(lane_traj_np, minlength=T)
        for t_row in range(T):
            c = int(counts[t_row])
            if cur and cur_lanes + c > params.batch_size:
                groups.append(cur)
                cur, cur_lanes = [], 0
            cur.append(t_row)
            cur_lanes += c
        if cur:
            groups.append(cur)
    else:
        groups = [list(range(T))]

    best_rms = np.full(T, np.inf)
    kind = np.zeros(T, np.int32)
    el = np.zeros((T, 6))
    eqv = np.zeros((T, 6))
    epoch = np.zeros(T)
    corrected = np.zeros(T, bool)

    for group in groups:
        gset = np.isin(lane_traj_np, group)
        g_lanes = np.nonzero(gset)[0]
        remap = {t: i for i, t in enumerate(group)}
        g_traj = np.array([remap[t] for t in lane_traj_np[g_lanes]])
        Tg = len(group)

        # pad lanes to a bucket with inert rows (window all-False -> inf
        # score -> excluded from the segment argmin); padded trajectory
        # rows have no valid observations
        Lg = len(g_lanes)
        Lb = _bucket(Lg)
        Tb = _bucket(Tg + (1 if Lb > Lg else 0))

        def lane_pad(x):
            out = np.concatenate([x[g_lanes], np.repeat(x[g_lanes[:1]], Lb - Lg, axis=0)])
            return out

        g_window = np.concatenate(
            [window_mask[g_lanes], np.zeros((Lb - Lg, n_max), bool)]
        )
        g_lane_traj = np.concatenate(
            [g_traj, np.full(Lb - Lg, Tg, np.int64)]
        )

        def traj_pad(x):
            shape = (Tb - Tg,) + x.shape[1:]
            return np.concatenate([x[group], np.zeros(shape, x.dtype)])

        tri = GaussTriplets(
            jnp.asarray(lane_pad(lane_ra)),
            jnp.asarray(lane_pad(lane_dec)),
            jnp.asarray(lane_pad(lane_t)),
            jnp.asarray(lane_pad(lane_pos)),
        )
        g_obs = tuple(
            jnp.asarray(traj_pad(x))
            for x in (obs_mjd, obs_ra, obs_dec, obs_sra, obs_sdec, obs_helio)
        )
        out = _iod_kernel_jit(
            tri, g_obs, jnp.asarray(g_lane_traj), jnp.asarray(g_window), params
        )
        g_rms, g_kind, g_el, g_eqv, g_epoch, g_corr = (np.asarray(o) for o in out)
        idx = np.asarray(group)
        best_rms[idx] = g_rms[:Tg]
        kind[idx] = g_kind[:Tg]
        el[idx] = g_el[:Tg]
        eqv[idx] = g_eqv[:Tg]
        epoch[idx] = g_epoch[:Tg]
        corrected[idx] = g_corr[:Tg]

    # kernel outputs are per-trajectory (the segment argmin runs on device)
    lane_counts = np.bincount(lane_traj_np, minlength=len(kept_tids))

    for t_row, tid in enumerate(kept_tids):
        if not np.isfinite(best_rms[t_row]):
            results[tid] = FitResult(
                tid, ok=False,
                error=f"NoViableOrbit(attempts={int(lane_counts[t_row])})",
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
