"""Host-side triplet generation, scoring, and RMS-window selection.

Behavioral parity with ``src/initial_orbit_determination/triplet_generation/``:

* ``downsample_uniform_with_edges`` (index_generator.rs:66-75),
* feasible windows dt_min <= t_k - t_i <= dt_max with i < j < k
  (index_generator.rs:94-260),
* spacing weight s(dt) = dtw/dt if dt <= dtw else 1 + dt/dtw summed over
  both gaps (mod.rs:148-274), best-K selection (mod.rs:365-408),

and with ``select_rms_interval`` (trajectory.rs:294-350).

This stage is O(n^2) index bookkeeping on at most 100 downsampled epochs per
trajectory — plain numpy is the right tool; the output feeds the device
kernel.
"""

from typing import List, Tuple

import numpy as np


def downsample_uniform_with_edges(n: int, max_keep: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if max_keep >= n:
        return np.arange(n)
    if max_keep <= 3:
        return np.array([0, n // 2, n - 1])
    i = np.arange(max_keep)
    return i * (n - 1) // (max_keep - 1)


def triplet_weight(t1, t2, t3, dtw: float):
    def s_gap(dt):
        r = dt / dtw
        return np.where(r <= 1.0, 1.0 / np.maximum(r, 1e-300), 1.0 + r)

    return s_gap(t2 - t1) + s_gap(t3 - t2)


def generate_triplet_indices(
    epochs: np.ndarray,
    dt_min: float,
    dt_max: float,
    optimal_interval: float,
    max_obs: int,
    max_triplets: int,
) -> List[Tuple[int, int, int]]:
    """Best-K spacing-weighted feasible triplets (indices into ``epochs``).

    ``epochs`` must be sorted ascending.  Returns original (pre-downsample)
    indices.  Fully vectorized (the reference's lazy two-pointer stream +
    bounded heap, index_generator.rs:94-260 / mod.rs:365-408, is a scalar-CPU
    shape; enumerating the <= m^3/6 combinations with numpy and taking a
    lexicographic best-K is equivalent and ~100x faster from Python).
    """
    n = len(epochs)
    keep = downsample_uniform_with_edges(n, max_obs)
    t = epochs[keep]
    m = len(t)
    if m < 3:
        return []
    a, j, k = np.meshgrid(
        np.arange(m), np.arange(m), np.arange(m), indexing="ij", sparse=True
    )
    span = t[k] - t[a]
    feasible = (a < j) & (j < k) & (span >= dt_min) & (span <= dt_max)
    ai, ji, ki = np.nonzero(feasible)
    if ai.size == 0:
        return []
    w = triplet_weight(t[ai], t[ji], t[ki], optimal_interval)
    # ascending (w, a, j, k) — identical to the scalar sort order
    order = np.lexsort((ki, ji, ai, w))[:max_triplets]
    ka = keep[ai[order]]
    kj = keep[ji[order]]
    kk = keep[ki[order]]
    return [(int(x), int(y), int(z)) for x, y, z in zip(ka, kj, kk)]


def select_rms_interval(
    epochs: np.ndarray, idx1: int, idx3: int, extf: float, dtmax: float
) -> Tuple[int, int]:
    """RMS-window [start, end] (inclusive) around a triplet.

    Parity: ``select_rms_interval`` (trajectory.rs:294-350): extf x triplet
    span, or 10 x full arc when extf < 0, floored at dtmax.
    """
    w0, w1 = select_rms_interval_batch(
        epochs, np.asarray([idx1]), np.asarray([idx3]), extf, dtmax
    )
    return int(w0[0]), int(w1[0])


def select_rms_interval_batch(
    epochs: np.ndarray, idx1: np.ndarray, idx3: np.ndarray, extf: float,
    dtmax: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized :func:`select_rms_interval` over many triplets at once.

    ``epochs`` sorted ascending; ``idx1``/``idx3`` arrays of triplet
    first/last indices.  Returns (start, end) index arrays (inclusive).
    """
    epochs = np.asarray(epochs)
    idx1 = np.asarray(idx1)
    idx3 = np.asarray(idx3)
    if extf >= 0.0:
        dt = (epochs[idx3] - epochs[idx1]) * extf
    else:
        dt = np.full(idx1.shape, 10.0 * (epochs[-1] - epochs[0]))
    if dtmax >= 0.0:
        dt = np.maximum(dt, dtmax)
    # first index with epochs[i] >= epochs[idx1] - dt
    i_start = np.searchsorted(epochs, epochs[idx1] - dt, side="left")
    # last index with epochs[i] <= epochs[idx3] + dt
    i_end = np.searchsorted(epochs, epochs[idx3] + dt, side="right") - 1
    return i_start, np.maximum(i_end, idx3)
