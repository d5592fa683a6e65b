"""Earth-orientation and reference-frame oracles.

Oracle values from the reference's inline tests
(``src/earth_orientation.rs:595-683``, ``src/ref_system.rs:464-899``,
``src/constants.rs:93-121``).  Tolerances are principled f64 bounds (the
reference pins bits; our summation order differs by design).
"""

import numpy as np
import pytest

from outfit_tpu.constants import (
    ROT_ECLMJ2000_TO_EQUMJ2000,
    ROT_EQUMJ2000_TO_ECLMJ2000,
    T2000,
)
from outfit_tpu.frames import (
    RefEpoch,
    RefSystem,
    equequ,
    nutn80,
    obleq,
    prec,
    rnut80,
    rotmt,
    rotpn,
)

#: rnut80(T2000) oracle from src/earth_orientation.rs:613-633.  Our rnut80
#: returns the passive (directly-applicable) matrix = transpose of the
#: reference's stored nalgebra matrix; the nested literal there is
#: column-major, so read row-wise it is already our matrix.
RNUT_T2000 = np.array(
    [
        [0.9999999977217079, 6.19323109890795e-5, 2.6850942970991024e-5],
        [-6.193306258211379e-5, 0.9999999976903892, 2.799138089948361e-5],
        [-2.6849209338068913e-5, -2.7993043796858963e-5, 0.9999999992477547],
    ]
)


def test_obleq_oracle():
    assert float(obleq(T2000)) == pytest.approx(0.40909280422232897, abs=1e-16)


def test_nutn80_oracle():
    dpsi, deps = nutn80(T2000)
    assert float(dpsi) == pytest.approx(-13.923385169502602, abs=1e-11)
    assert float(deps) == pytest.approx(-5.773808263765919, abs=1e-11)


def test_nutn80_batched():
    t = np.array([T2000, 57000.0, 60000.0])
    dpsi, deps = nutn80(t)
    assert dpsi.shape == (3,)
    # amplitudes stay physical (|dpsi| < 20 arcsec)
    assert np.all(np.abs(np.asarray(dpsi)) < 20)
    assert np.all(np.abs(np.asarray(deps)) < 12)


def test_rnut80_oracle():
    rn = np.asarray(rnut80(T2000))
    np.testing.assert_allclose(rn, RNUT_T2000, rtol=0, atol=1e-13)


def test_equequ_oracle():
    import math

    expected = (math.pi / 648000.0) * (-13.923385169502602) * math.cos(
        0.40909280422232897
    )
    assert float(equequ(T2000)) == pytest.approx(expected, abs=1e-15)


def test_rotmt_orthonormal():
    for k in range(3):
        r = np.asarray(rotmt(0.7, k))
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-15)
    # frame-rotation convention: rotmt(eps, 0) == equ->ecl
    eps = float(obleq(T2000))
    r = np.asarray(rotmt(eps, 0))
    np.testing.assert_allclose(r, ROT_EQUMJ2000_TO_ECLMJ2000, atol=1e-15)


def test_rotpn_equm_to_eclm_j2000():
    r = np.asarray(rotpn(RefSystem.equm(), RefSystem.eclm()))
    np.testing.assert_allclose(r, ROT_EQUMJ2000_TO_ECLMJ2000, rtol=0, atol=1e-15)
    r_inv = np.asarray(rotpn(RefSystem.eclm(), RefSystem.equm()))
    np.testing.assert_allclose(r_inv, ROT_ECLMJ2000_TO_EQUMJ2000, rtol=0, atol=1e-15)


def test_rotpn_equm_to_equt_j2000():
    r = np.asarray(rotpn(RefSystem.equm(), RefSystem.equt()))
    np.testing.assert_allclose(r, RNUT_T2000, rtol=0, atol=1e-13)


def test_rotpn_roundtrip_of_date():
    # Equt <-> Equm roundtrip (the Eclm-with-epoch-mismatch path is excluded:
    # the reference's own Y-axis obliquity branch there is not an inverse
    # pair, and we reproduce it bug-for-bug — see test_rotpn_ofdate_oracles).
    src = RefSystem.equt(RefEpoch.of_date(60725.5))
    dst = RefSystem.equm(RefEpoch.of_date(60730.5))
    fwd = np.asarray(rotpn(src, dst))
    bwd = np.asarray(rotpn(dst, src))
    np.testing.assert_allclose(fwd @ bwd, np.eye(3), atol=1e-13)
    np.testing.assert_allclose(fwd @ fwd.T, np.eye(3), atol=1e-13)

    fwd = np.asarray(rotpn(RefSystem.equt(RefEpoch.of_date(60725.5)), RefSystem.eclm()))
    np.testing.assert_allclose(fwd @ fwd.T, np.eye(3), atol=1e-13)


#: Of-date rotpn oracles from the reference's inline tests
#: (src/ref_system.rs:638-845), read row-wise (our passive convention).
_OFDATE_CASES = [
    (
        ("Equt", 60725.5),
        ("Equm", 60730.5),
        [
            [0.9999999999959558, 2.6103210920298055e-6, 1.1287777487165376e-6],
            [-2.610372560299571e-6, 0.9999999989569648, 4.559886322796942e-5],
            [-1.1286587198650923e-6, -4.559886617430879e-5, 0.9999999989597347],
        ],
    ),
    (
        ("Equt", 60725.5),
        ("Eclm", 60730.5),
        [
            [0.9999999999959558, 2.6103210920298055e-6, 1.1287777487165376e-6],
            [-2.8439248114746454e-6, 0.9174866295910213, 0.3977666206629458],
            [2.660107394168916e-9, -0.3977666206645475, 0.9174866295947346],
        ],
    ),
    (
        ("Equm", 60725.5),
        ("Equt", 60730.5),
        [
            [0.9999999999382557, -1.019473782042265e-5, -4.422167976508847e-6],
            [1.0194536102237101e-5, 0.9999999989077697, -4.561284900943888e-5],
            [4.4226329827165825e-6, 4.561280392464384e-5, 0.9999999989499561],
        ],
    ),
    (
        # The reference removes Eclm obliquity about the Y axis when epochs
        # mismatch (src/ref_system.rs:252,265) — reproduced for parity.
        ("Eclm", 60725.5),
        ("Equm", 60730.5),
        [
            [0.9175052829851363, -3.0616188567489498e-6, 0.3977235920648803],
            [2.809050665755966e-6, 0.9999999999953132, 1.2176799173935054e-6],
            [-0.3977235920667443, -2.0361171295958094e-12, 0.9175052829894363],
        ],
    ),
    (
        ("Equt", 57028.479297592596),
        ("Eclm", None),  # J2000 — the pvobs path
        [
            [0.9999932036120499, 0.003381495004957589, 0.0014690885747894438],
            [-0.0036868307528666357, 0.9174941827437706, 0.3977321107357815],
            [-2.9510755403679666e-6, -0.3977348238749929, 0.917500414097138],
        ],
    ),
]


@pytest.mark.parametrize("case", _OFDATE_CASES, ids=lambda c: f"{c[0][0]}{c[0][1]}->{c[1][0]}{c[1][1]}")
def test_rotpn_ofdate_oracles(case):
    (skind, sdate), (dkind, ddate), oracle = case

    def mk(kind, date):
        ep = RefEpoch.j2000() if date is None else RefEpoch.of_date(date)
        return RefSystem(kind, ep)

    r = np.asarray(rotpn(mk(skind, sdate), mk(dkind, ddate)))
    np.testing.assert_allclose(r, np.array(oracle), rtol=0, atol=1e-13)


def test_rotpn_identity():
    r = np.asarray(rotpn(RefSystem.equm(), RefSystem.equm()))
    np.testing.assert_allclose(r, np.eye(3), atol=0)


def test_rotpn_batched_epochs():
    dates = np.array([58000.0, 59000.0, 60000.0])
    src = RefSystem.equt(RefEpoch.of_date(dates))
    dst = RefSystem.eclm(RefEpoch.j2000())
    r = np.asarray(rotpn(src, dst))
    assert r.shape == (3, 3, 3)
    for i, d in enumerate(dates):
        ri = np.asarray(
            rotpn(RefSystem.equt(RefEpoch.of_date(float(d))), dst)
        )
        np.testing.assert_allclose(r[i], ri, atol=1e-15)


def test_prec_identity_at_j2000():
    np.testing.assert_allclose(np.asarray(prec(T2000)), np.eye(3), atol=1e-15)


def test_prec_drift():
    r = np.asarray(prec(60000.0))
    # ~23 years of precession: zeta+z ~ 2*0.64064 deg/cy * 0.23 cy ~ 1e-3 rad
    assert 1e-4 < abs(r[0, 1]) < 1e-2
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-15)
