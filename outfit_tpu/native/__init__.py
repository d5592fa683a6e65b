"""Native runtime components (C, ctypes-bound).

Currently: the fast MPC 80-column parser (``mpc80.c``), compiled on demand
with the system compiler and cached.  The pure-Python implementation in
``observations/mpc80.py`` is the reference behavior and the fallback —
:func:`parse_file_native` is validated field-for-field against it in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import List, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "mpc80.c")
_lib = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    cache_dir = os.environ.get(
        "OUTFIT_NATIVE_DIR", os.path.expanduser("~/.cache/outfit_tpu")
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "outfit_mpc80.so")
    try:
        if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(_SRC):
            with tempfile.TemporaryDirectory() as td:
                tmp = os.path.join(td, "outfit_mpc80.so")
                subprocess.run(
                    ["cc", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC, "-lm"],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.parse_mpc80.restype = ctypes.c_long
        lib.parse_mpc80.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_char_p,
        ]
        _lib = lib
    except (subprocess.CalledProcessError, OSError):
        _build_failed = True
    return _lib


def native_available() -> bool:
    return _build() is not None


def parse_file_native(path: str):
    """Parse an MPC 80-col file with the native parser.

    Returns ``(mjd_tt, ra, dec, mag, ids, obscodes, discovery, catalogs)``
    as numpy arrays (ids 'U12'-style stripped strings), or None if the
    native library is unavailable.
    """
    lib = _build()
    if lib is None:
        return None
    with open(path, "rb") as fh:
        buf = fh.read()
    n_lines = buf.count(b"\n") + 2
    mjd = np.empty(n_lines)
    ra = np.empty(n_lines)
    dec = np.empty(n_lines)
    mag = np.empty(n_lines)
    ids = np.zeros(n_lines, dtype="S12")
    obscodes = np.zeros(n_lines, dtype="S3")
    disc = np.zeros(n_lines, dtype=np.int8)
    cats = np.zeros(n_lines, dtype="S1")
    n = lib.parse_mpc80(
        buf,
        len(buf),
        mjd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ra.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        dec.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        mag.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ids.ctypes.data_as(ctypes.c_char_p),
        obscodes.ctypes.data_as(ctypes.c_char_p),
        disc.ctypes.data_as(ctypes.c_char_p),
        cats.ctypes.data_as(ctypes.c_char_p),
    )
    ids_str = np.char.strip(ids[:n].astype("U12"))
    codes = np.char.strip(obscodes[:n].astype("U3"))
    return (
        mjd[:n],
        ra[:n],
        dec[:n],
        mag[:n],
        ids_str,
        codes,
        disc[:n].astype(bool),
        cats[:n].astype("U1"),
    )
