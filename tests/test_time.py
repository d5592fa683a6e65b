"""Time-scale and GMST oracles.

Oracle values come from the reference's inline tests
(``src/time.rs:363-422``); tolerances are 1e-12 days (~0.1 us) instead of the
reference's bit-exact ``assert_eq!`` because our UTC->TT goes through an
explicit leap-second table rather than hifitime.
"""

import numpy as np
import pytest

from outfit_tpu.time import (
    date_to_mjd,
    frac_date_to_mjd,
    gmst,
    jd_to_mjd,
    mjd_to_jd,
    tt_mjd_to_utc,
    utc_mjd_to_tt,
)
from outfit_tpu.constants import T2000


def test_date_to_mjd():
    mjd = date_to_mjd(["2021-01-01T00:00:00", "2021-01-02T00:00:00"])
    np.testing.assert_allclose(mjd, [59215.0, 59216.0], rtol=0, atol=1e-12)


def test_mjd_jd_roundtrip():
    mjd = np.array([59215.0, 59216.0])
    jd = mjd_to_jd(mjd)
    np.testing.assert_array_equal(jd, [2459215.5, 2459216.5])
    np.testing.assert_array_equal(jd_to_mjd(jd), mjd)


@pytest.mark.parametrize(
    "datestr,expected",
    [
        ("2021 1 1.0", 59215.00080074074),
        ("2021 1 1.5", 59215.50080074074),
        ("2021 1 1.75", 59215.75080074074),
        ("2021 1 1.875", 59215.87580074074),
        ("2021 1 1.999", 59215.99980074074),
        ("2021 1 1.9999", 59216.00070074073),
        ("1976 09 20.93878", 43041.93932611111),
    ],
)
def test_frac_date_to_mjd(datestr, expected):
    assert frac_date_to_mjd(datestr) == pytest.approx(expected, abs=1e-9)


def test_utc_tt_roundtrip():
    mjd_utc = np.linspace(43000.0, 61000.0, 997)
    tt = utc_mjd_to_tt(mjd_utc)
    back = tt_mjd_to_utc(tt)
    np.testing.assert_allclose(back, mjd_utc, rtol=0, atol=1e-12)


def test_gmst_oracle():
    assert float(gmst(57028.478514610404)) == pytest.approx(
        4.851925725092499, abs=1e-13
    )
    assert float(gmst(T2000)) == pytest.approx(4.894961212789145, abs=1e-13)


def test_gmst_batched():
    t = np.array([57028.478514610404, T2000, 60000.25])
    g = np.asarray(gmst(t))
    assert g.shape == (3,)
    assert np.all((g >= 0) & (g < 2 * np.pi))
    assert g[0] == pytest.approx(4.851925725092499, abs=1e-13)


def test_ut1_provider_finals_parsing(tmp_path):
    """Synthetic IERS finals2000A fixed-width rows -> interpolated DUT1."""
    from outfit_tpu.time.scales import Ut1Provider

    lines = []
    for mjd, dut1 in [(57000, 0.40), (57001, 0.38), (57002, 0.36)]:
        # columns: MJD at 7:15, UT1-UTC at 58:68
        line = " " * 7 + f"{mjd:8.2f}" + " " * 43 + f"{dut1:10.7f}" + " " * 20
        lines.append(line)
    p = tmp_path / "finals2000A.all"
    p.write_text("\n".join(lines))
    ut1 = Ut1Provider.from_finals2000a(str(p))
    assert ut1.dut1_seconds(57000.0) == pytest.approx(0.40)
    assert ut1.dut1_seconds(57000.5) == pytest.approx(0.39)
    # ut1 epoch = utc + dut1
    assert float(ut1.utc_mjd_to_ut1(57001.0)) == pytest.approx(
        57001.0 + 0.38 / 86400.0, abs=1e-12
    )


def test_ut1_default_is_zero_dut1():
    from outfit_tpu.time.scales import Ut1Provider

    ut1 = Ut1Provider()
    assert ut1.dut1_seconds(57000.0) == 0.0


class TestUt1Fetch:
    def test_fetch_offline_falls_back(self, monkeypatch, tmp_path):
        """Zero-egress: fetch() degrades to the DUT1=0 provider and writes
        a weekly retry marker instead of blocking on the network."""
        from outfit_tpu.time.scales import Ut1Provider

        monkeypatch.setenv("OUTFIT_NO_DOWNLOAD", "1")
        monkeypatch.delenv("OUTFIT_FINALS2000A", raising=False)
        p = Ut1Provider.fetch(cache_dir=str(tmp_path))
        assert p.dut1_seconds(57000.0) == 0.0

    def test_fetch_uses_env_file(self, monkeypatch, tmp_path):
        from outfit_tpu.time.scales import Ut1Provider

        f = tmp_path / "finals2000A.all"
        rows = []
        for mjd, dut in ((57000.0, -0.4), (57400.0, -0.2)):
            rows.append(
                " " * 7 + f"{mjd:8.2f}" + " " * 43 + f"{dut:10.7f}" + " " * 20
            )
        f.write_text("\n".join(rows))
        monkeypatch.setenv("OUTFIT_FINALS2000A", str(f))
        p = Ut1Provider.fetch()
        assert abs(p.dut1_seconds(57200.0) + 0.3) < 1e-9
