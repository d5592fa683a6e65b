"""Ephemeris source resolution: source strings -> official URLs -> cache paths.

Parity: ``EphemFileSource`` / ``EphemFilePath``
(``src/jpl_ephem/download_jpl_file.rs:60-390``):

* source strings ``"horizon:DE440"`` / ``"naif:DE440"`` with per-backend
  version tables (``horizon/horizon_version.rs:87-210``,
  ``naif/naif_version.rs:64-110``),
* official JPL/NAIF base URLs (``download_jpl_file.rs:140-147``),
* OS cache layout ``<cache root>/outfit_cache/jpl_ephem/{jpl_horizon|naif}/
  <filename>`` (``download_jpl_file.rs:352-372``), including the reference's
  quirk of caching Horizon legacy binaries under their NAIF-style
  ``DE440.bsp`` name (``filename()`` dispatches to ``to_filename`` for the
  Horizon arm, ``download_jpl_file.rs:173-178``),
* resolve = return the cached path if present, otherwise download
  (``get_ephemeris_file``, ``download_jpl_file.rs:286-305``).  Downloads
  degrade gracefully in zero-egress environments: the resolver raises
  ``JPLFileNotFound`` with the URL and cache path it would have used.

Everything except the actual fetch is pure logic, unit-tested offline
(tests/test_ephem.py::TestResolver).
"""

from __future__ import annotations

import os
import sys
from dataclasses import dataclass

from outfit_tpu.errors import (
    InvalidJPLEphemFileVersion,
    InvalidJPLStringFormat,
    JPLFileNotFound,
)

#: Horizon (legacy DE binary) versions -> official path fragment under
#: HORIZON_BASE_URL.  (horizon_version.rs:87-110)
HORIZON_FILES = {
    "DE102": "de102/lnxm1410p3002.102",
    "DE200": "de200/lnxm1600p2170.200",
    "DE202": "de202/lnxp1900p2050.202",
    "DE403": "de403/lnxp1600p2200.403",
    "DE405": "de405/lnxp1600p2200.405",
    "DE406": "de406/lnxm3000p3000.406",
    "DE410": "de410/lnxp1960p2020.410",
    "DE413": "de413/lnxp1900p2050.413",
    "DE414": "de414/lnxp1600p2200.414",
    "DE418": "de418/lnxp1900p2050.418",
    "DE421": "de421/lnxp1900p2053.421",
    "DE422": "de422/lnxm3000p3000.422",
    "DE423": "de423/lnxp1800p2200.423",
    "DE430": "de430/linux_p1550p2650.430",
    "DE430t": "de430t/linux_p1550p2650.430t",
    "DE431": "de431/lnxm13000p17000.431",
    "DE440": "de440/linux_p1550p2650.440",
    "DE440t": "de440t/linux_p1550p2650.440t",
    "DE441": "de441/linux_m13000p17000.441",
}

#: NAIF SPK versions -> canonical kernel filename.  (naif_version.rs:64-110;
#: parsing is case-sensitive and includes the split DE431/DE441 parts)
NAIF_FILES = {
    "DE430": "de430.bsp",
    "DE431_part-1": "de431_part-1.bsp",
    "DE431_part-2": "de431_part-2.bsp",
    "DE432": "de432.bsp",
    "DE435": "de435.bsp",
    "DE438": "de438.bsp",
    "DE440": "de440.bsp",
    "DE440s": "de440s.bsp",
    "DE441_part-1": "de441_part-1.bsp",
    "DE441_part-2": "de441_part-2.bsp",
    "DE442": "de442.bsp",
}

HORIZON_BASE_URL = "https://ssd.jpl.nasa.gov/ftp/eph/planets/Linux/"
NAIF_BASE_URL = "https://naif.jpl.nasa.gov/pub/naif/generic_kernels/spk/planets/"


@dataclass(frozen=True)
class EphemFileSource:
    """Parsed ``"{source}:{version}"`` selector (download_jpl_file.rs:87-126)."""

    scheme: str  # "horizon" | "naif"
    version: str  # validated against the backend's version table

    @classmethod
    def parse(cls, source: str) -> "EphemFileSource":
        parts = source.split(":")
        if len(parts) != 2:
            raise InvalidJPLStringFormat(
                "Expected format: {source}:{version}, example: 'naif:DE440' "
                "or 'horizon:DE440'"
            )
        scheme, version = parts[0].lower(), parts[1]
        if scheme == "horizon":
            if version not in HORIZON_FILES:
                raise InvalidJPLEphemFileVersion(
                    f"Invalid JPL Horizon version: {version}"
                )
        elif scheme == "naif":
            if version not in NAIF_FILES:
                raise InvalidJPLEphemFileVersion(
                    f"Invalid NAIF version: {version}"
                )
        else:
            raise InvalidJPLStringFormat(
                f"Unknown ephemeris file source: {parts[0]}"
            )
        return cls(scheme, version)

    # -- URL / path composition (pure logic, offline-testable) --------------

    @property
    def url(self) -> str:
        """Official download URL (download_jpl_file.rs:140-166)."""
        if self.scheme == "horizon":
            return HORIZON_BASE_URL + HORIZON_FILES[self.version]
        return NAIF_BASE_URL + NAIF_FILES[self.version]

    @property
    def cache_subdir(self) -> str:
        """Backend subdirectory under the cache root
        (download_jpl_file.rs:168-171)."""
        return "jpl_horizon" if self.scheme == "horizon" else "naif"

    @property
    def filename(self) -> str:
        """Local cache filename.  Mirrors the reference exactly: the
        Horizon arm caches under the NAIF-style name (``DE440.bsp``), the
        NAIF arm under the canonical kernel name (``de440.bsp``)
        (download_jpl_file.rs:173-178)."""
        if self.scheme == "horizon":
            return self.version + ".bsp"
        return NAIF_FILES[self.version]

    def cache_path(self, cache_root: str | None = None) -> str:
        """The on-disk path the reference would use
        (``<cache root>/outfit_cache/jpl_ephem/<subdir>/<filename>``)."""
        root = cache_root or os_cache_root()
        return os.path.join(
            root, "outfit_cache", "jpl_ephem", self.cache_subdir, self.filename
        )


def os_cache_root() -> str:
    """Per-OS user cache root (the ``directories`` crate's ``cache_dir()``):
    $XDG_CACHE_HOME or ~/.cache on Linux, ~/Library/Caches on macOS,
    %LOCALAPPDATA% on Windows."""
    if sys.platform == "darwin":
        return os.path.expanduser("~/Library/Caches")
    if os.name == "nt":
        return os.environ.get(
            "LOCALAPPDATA", os.path.expanduser(r"~\AppData\Local")
        )
    return os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))


def validate_ephemeris_bytes(path: str, scheme: str) -> bool:
    """Cheap integrity check on a downloaded DE binary BEFORE caching it.

    An HTTP-200 error page or captive-portal response would otherwise be
    cached permanently (the ``.part`` + ``os.replace`` dance only guards
    truncation).  DE kernels are 10 MB class at minimum; NAIF kernels open
    with the DAF magic ``DAF/SPK`` (daf_header.rs parses it), Horizon
    legacy binaries carry the three 84-char TTL title strings beginning
    ``JPL Planetary Ephemeris`` (horizon_data.rs:123-147)."""
    try:
        if os.path.getsize(path) < (1 << 20):
            return False
        with open(path, "rb") as fh:
            head = fh.read(256)
    except OSError:
        return False
    if scheme == "naif":
        return head.startswith(b"DAF/")
    return b"JPL" in head and b"Ephemeris" in head


def download_file(url: str, path: str, timeout: float = 60.0,
                  validate=None) -> None:
    """Stream ``url`` to ``path`` (chunked; the files are 100 MB class).

    Writes to ``path + '.part'`` first so an interrupted fetch never leaves
    a truncated file where the resolver would trust it.  ``validate``
    (optional) is called with the ``.part`` path before the move; returning
    falsy deletes the download and raises ``OSError`` so the caller's
    zero-egress degradation path reports the failure."""
    import urllib.request

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".part"
    req = urllib.request.Request(url, headers={"User-Agent": "outfit-tpu"})
    with urllib.request.urlopen(req, timeout=timeout) as r, open(tmp, "wb") as f:
        while True:
            chunk = r.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)
    if validate is not None and not validate(tmp):
        os.remove(tmp)
        raise OSError(
            f"downloaded content from {url} failed integrity validation "
            "(not a JPL ephemeris binary — error page or truncated response?)"
        )
    os.replace(tmp, path)


def resolve_ephemeris_file(
    source: str | EphemFileSource,
    download: bool = True,
    cache_root: str | None = None,
) -> str:
    """Resolve a source selector to a local file path, fetching on miss.

    Parity: ``EphemFilePath::get_ephemeris_file``
    (download_jpl_file.rs:286-305).  Zero-egress degradation: any network
    failure raises ``JPLFileNotFound`` naming the URL and the cache path,
    so callers can place the file manually."""
    src = (
        source
        if isinstance(source, EphemFileSource)
        else EphemFileSource.parse(source)
    )
    path = src.cache_path(cache_root)
    if os.path.exists(path):
        return path
    if download and os.environ.get("OUTFIT_NO_DOWNLOAD") != "1":
        try:
            download_file(
                src.url, path,
                validate=lambda p: validate_ephemeris_bytes(p, src.scheme),
            )
            return path
        except Exception as e:  # urllib raises a small zoo of types
            raise JPLFileNotFound(
                f"{src.scheme}:{src.version} is not cached at {path} and "
                f"downloading {src.url} failed ({type(e).__name__}: {e}); "
                "place the file there manually or set $OUTFIT_EPHEM_DIR"
            ) from e
    raise JPLFileNotFound(
        f"{src.scheme}:{src.version} is not cached at {path} "
        f"(downloads disabled); fetch {src.url} manually"
    )
