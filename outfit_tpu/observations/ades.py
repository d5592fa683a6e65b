"""ADES (IAU Astrometric Data Exchange Standard) XML parser.

Parity surface: photom's ADES ingestion (SURVEY 2.12; fixtures
``tests/data/example_ades*.xml``, ``flat_ades.xml``).  Handles both the
obsBlock/obsData layout and the flat layout of ``<optical>`` elements.

Fields consumed: permID / provID / trkSub (trajectory id, in that priority),
stn (observatory), obsTime (ISO UTC -> MJD TT), ra / dec (degrees),
rmsRA / rmsDec (arcsec; rmsRA is per ADES already cos(dec)-scaled), mag.
"""

import datetime as _dt
import xml.etree.ElementTree as ET
from typing import List, Optional

from outfit_tpu.constants import RADEG, RADSEC
from outfit_tpu.observations.mpc80 import MpcRecord
from outfit_tpu.time.scales import utc_mjd_to_tt


def _obstime_to_mjd_tt(text: str) -> float:
    text = text.strip()
    if text.endswith("Z"):
        text = text[:-1]
    dt = _dt.datetime.fromisoformat(text)
    delta = dt - _dt.datetime(1858, 11, 17)
    mjd_utc = delta.days + delta.seconds / 86400.0 + delta.microseconds / 86.4e9
    return float(utc_mjd_to_tt(mjd_utc))


def _text(el, tag) -> Optional[str]:
    child = el.find(tag)
    return child.text.strip() if child is not None and child.text else None


def parse_ades_file(path: str) -> List[MpcRecord]:
    """Parse an ADES XML file into observation records.

    RA/Dec sigmas come from rmsRA/rmsDec when present (converted from arcsec
    to radians; the caller's error model fills any gaps), recorded as NaN
    otherwise.
    """
    tree = ET.parse(path)
    root = tree.getroot()
    records: List[MpcRecord] = []
    for opt in root.iter("optical"):
        traj_id = (
            _text(opt, "permID") or _text(opt, "provID") or _text(opt, "trkSub")
        )
        obstime = _text(opt, "obsTime")
        ra = _text(opt, "ra")
        dec = _text(opt, "dec")
        if traj_id is None or obstime is None or ra is None or dec is None:
            continue
        stn = _text(opt, "stn") or "500"
        mag_txt = _text(opt, "mag")
        rec = MpcRecord(
            traj_id=traj_id,
            mjd_tt=_obstime_to_mjd_tt(obstime),
            ra=float(ra) * RADEG,
            dec=float(dec) * RADEG,
            mag=float(mag_txt) if mag_txt else None,
            band=_text(opt, "band") or " ",
            observatory=stn,
            discovery=(_text(opt, "disc") == "*"),
        )
        records.append(rec)
    return records


def ades_sigmas(path: str):
    """Per-record (rms_ra, rms_dec) in radians (NaN when absent), aligned
    with :func:`parse_ades_file` output order."""
    import math

    tree = ET.parse(path)
    out = []
    for opt in tree.getroot().iter("optical"):
        if _text(opt, "obsTime") is None or _text(opt, "ra") is None:
            continue
        if _text(opt, "permID") or _text(opt, "provID") or _text(opt, "trkSub"):
            rms_ra = _text(opt, "rmsRA")
            rms_dec = _text(opt, "rmsDec")
            out.append(
                (
                    float(rms_ra) * RADSEC if rms_ra else math.nan,
                    float(rms_dec) * RADSEC if rms_dec else math.nan,
                )
            )
    return out
