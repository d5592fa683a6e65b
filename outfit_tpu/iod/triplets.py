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
    indices.
    """
    n = len(epochs)
    keep = downsample_uniform_with_edges(n, max_obs)
    t = epochs[keep]
    m = len(t)
    cands = []
    for a in range(m - 2):
        # valid last indices k > a+1 with dt_min <= t[k]-t[a] <= dt_max
        for k in range(a + 2, m):
            span = t[k] - t[a]
            if span < dt_min:
                continue
            if span > dt_max:
                break
            for j in range(a + 1, k):
                w = float(triplet_weight(t[a], t[j], t[k], optimal_interval))
                cands.append((w, a, j, k))
    cands.sort(key=lambda c: (c[0], c[1], c[2], c[3]))
    out = []
    for w, a, j, k in cands[:max_triplets]:
        out.append((int(keep[a]), int(keep[j]), int(keep[k])))
    return out


def select_rms_interval(
    epochs: np.ndarray, idx1: int, idx3: int, extf: float, dtmax: float
) -> Tuple[int, int]:
    """RMS-window [start, end] (inclusive) around a triplet.

    Parity: ``select_rms_interval`` (trajectory.rs:294-350): extf x triplet
    span, or 10 x full arc when extf < 0, floored at dtmax.
    """
    n = len(epochs)
    if extf >= 0.0:
        dt = (epochs[idx3] - epochs[idx1]) * extf
    else:
        dt = 10.0 * (epochs[-1] - epochs[0])
    if dtmax >= 0.0:
        dt = max(dt, dtmax)

    i_start = idx1
    for i in range(idx1, -1, -1):
        if epochs[idx1] - epochs[i] > dt:
            break
        i_start = i
    i_end = n - 1
    for i in range(idx3, n):
        if epochs[i] - epochs[idx3] > dt:
            i_end = i - 1 if i > idx3 else idx3
            break
    else:
        i_end = n - 1
    return i_start, i_end
