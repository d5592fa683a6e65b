"""Conversion helpers and ADES ingestion."""

import math

import os

import numpy as np
import pytest

from outfit_tpu.conversion import (
    arcsec_to_rad,
    cartesian_to_radec,
    dec_sdms_prec,
    fmt_vec3_au,
    parse_dec_to_deg,
    parse_ra_to_deg,
    ra_hms_prec,
)
from outfit_tpu.observations import ObsDataset
from outfit_tpu.observations.ades import parse_ades_file

DATA = os.path.join(os.path.dirname(__file__), "data")


class TestConversion:
    def test_arcsec_to_rad(self):
        assert arcsec_to_rad(3600.0) == pytest.approx(math.radians(1.0), rel=1e-15)

    def test_parse_ra(self):
        deg, acc = parse_ra_to_deg("12 30 45.67")
        assert deg == pytest.approx((12 + 30 / 60 + 45.67 / 3600) * 15, rel=1e-12)
        assert acc == pytest.approx(0.01)
        assert parse_ra_to_deg("12 30") is None
        assert parse_ra_to_deg("ab cd ef") is None

    def test_parse_dec(self):
        deg, acc = parse_dec_to_deg("-23 26 45.1")
        assert deg == pytest.approx(-(23 + 26 / 60 + 45.1 / 3600), rel=1e-12)
        assert acc == pytest.approx(0.1)
        deg2, acc2 = parse_dec_to_deg("+10 15 30")
        assert deg2 == pytest.approx(10.258333333333333, rel=1e-12)
        assert acc2 == pytest.approx(1.0)

    def test_roundtrip_ra_formatting(self):
        rad = (18 + 45 / 60 + 12.345 / 3600) * math.pi / 12
        hh, mm, ss = ra_hms_prec(rad, 3)
        assert (hh, mm) == (18, 45)
        assert ss == pytest.approx(12.345, abs=1e-6)

    def test_dec_formatting_carry(self):
        rad = math.radians(10 + 59 / 60 + 59.9999 / 3600)
        sign, dd, mm, ss = dec_sdms_prec(rad, 2)
        assert sign == "+" and dd == 11 and mm == 0 and ss == 0.0

    def test_cartesian_to_radec(self):
        ra, dec, r = cartesian_to_radec([0.0, 1.0, 0.0])
        assert ra == pytest.approx(math.pi / 2)
        assert dec == pytest.approx(0.0)
        assert r == pytest.approx(1.0)
        assert cartesian_to_radec([0, 0, 0]) == (0.0, 0.0, 0.0)
        ra2, dec2, _ = cartesian_to_radec([1.0, -1.0, 1.0])
        assert ra2 > math.pi  # wrapped to [0, 2pi)

    def test_fmt_vec3(self):
        assert fmt_vec3_au([0.1234567, -1.0, 2.0], 3) == "[ 0.123, -1.000, 2.000 ] AU"


class TestAdes:
    def test_nested_obsblock_file(self):
        recs = parse_ades_file(f"{DATA}/example_ades.xml")
        assert recs
        r = recs[0]
        assert r.traj_id == "1234456"
        assert r.observatory == "F51"
        assert r.dec == pytest.approx(math.pi / 2)  # dec=90 in fixture
        assert 57629.0 < r.mjd_tt < 57630.0  # 2016-08-29

    def test_flat_file(self):
        recs = parse_ades_file(f"{DATA}/flat_ades.xml")
        assert len(recs) >= 2
        assert recs[0].traj_id == "1"
        assert recs[0].observatory == "535"

    def test_dataset_from_ades_with_sigmas(self):
        ds = ObsDataset.from_ades(f"{DATA}/example_ades.xml")
        assert len(ds) >= 1
        # rmsRA 0.15 arcsec present in the fixture
        assert ds.ra_error[0] == pytest.approx(0.15 * math.pi / 648000.0, rel=1e-9)

    def test_all_ades_fixtures_parse(self):
        for name in ("example_ades.xml", "example_ades2.xml", "flat_ades.xml"):
            recs = parse_ades_file(f"{DATA}/{name}")
            assert recs, name
            for r in recs:
                assert 0 <= r.ra < 2 * math.pi
                assert -math.pi / 2 <= r.dec <= math.pi / 2

    def test_malformed_record_keeps_sigma_alignment(self, tmp_path):
        """A block missing <dec> must be skipped by BOTH the record and the
        sigma pass (regression: ades_sigmas did not check dec, so every
        record after the malformed one received its neighbor's sigmas)."""
        from outfit_tpu.observations.ades import ades_sigmas

        xml = """<?xml version='1.0'?><ades version="2017">
  <optical><permID>1</permID><stn>535</stn>
    <obsTime>2016-08-29T00:00:00Z</obsTime><ra>10.0</ra><dec>1.0</dec>
    <rmsRA>0.10</rmsRA><rmsDec>0.11</rmsDec></optical>
  <optical><permID>2</permID><stn>535</stn>
    <obsTime>2016-08-29T01:00:00Z</obsTime><ra>11.0</ra>
    <rmsRA>9.99</rmsRA><rmsDec>9.99</rmsDec></optical>
  <optical><permID>3</permID><stn>535</stn>
    <obsTime>2016-08-29T02:00:00Z</obsTime><ra>12.0</ra><dec>3.0</dec>
    <rmsRA>0.30</rmsRA><rmsDec>0.31</rmsDec></optical>
</ades>"""
        path = str(tmp_path / "malformed.xml")
        with open(path, "w") as fh:
            fh.write(xml)
        recs = parse_ades_file(path)
        sig = ades_sigmas(path)
        assert [r.traj_id for r in recs] == ["1", "3"]
        assert len(sig) == len(recs)
        rad = math.pi / 648000.0
        assert sig[0][0] == pytest.approx(0.10 * rad)
        assert sig[1][0] == pytest.approx(0.30 * rad)
        assert sig[1][1] == pytest.approx(0.31 * rad)
