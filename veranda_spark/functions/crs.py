"""Pure-math CRS transforms: WGS84 lon/lat ↔ Web Mercator / UTM.

The reference delegates coordinate transforms to GDAL/osr
(gdalport.py:58-101; tests/test_gdal.py:21-49 round-trips Equi7).  This
engine implements the two projection families a web-scale image corpus
actually uses — spherical Web Mercator (EPSG:3857) and WGS84 UTM zones
(EPSG:326xx/327xx, Snyder transverse-Mercator series, sub-mm in-zone) —
as plain math over a swappable backend:

- backend ``F`` (pyspark.sql.functions): every transform is a JVM
  Column expression — whole-stage codegen, no Python in the hot path,
  reproducible in ANSI SQL for the DuckDB oracle;
- backend ``numpy``: the *same code* runs driver-side for tests and
  small fixtures.

One implementation, two execution targets — the numpy twin validates
the Column twin because they are literally the same formulas.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)
UTM_K0 = 0.9996
UTM_FALSE_EASTING = 500_000.0
UTM_FALSE_NORTHING_S = 10_000_000.0
#: spherical Web Mercator world half-extent (at lon=180)
WEBMERC_MAX = WGS84_A * math.pi


class _NumpyBackend:
    sin = staticmethod(np.sin)
    cos = staticmethod(np.cos)
    tan = staticmethod(np.tan)
    atan = staticmethod(np.arctan)
    asin = staticmethod(np.arcsin)
    atan2 = staticmethod(np.arctan2)
    sqrt = staticmethod(np.sqrt)
    log = staticmethod(np.log)
    exp = staticmethod(np.exp)
    radians = staticmethod(np.radians)
    degrees = staticmethod(np.degrees)
    where = staticmethod(np.where)
    abs = staticmethod(np.abs)


class _SparkBackend:
    def __getattr__(self, name: str):
        from pyspark.sql import functions as F

        return getattr(F, {"atan": "atan"}.get(name, name))

    @staticmethod
    def where(cond, a, b):
        from pyspark.sql import functions as F

        return F.when(cond, a).otherwise(b)


NP = _NumpyBackend()
SPARK = _SparkBackend()


# ---- Web Mercator (EPSG:3857, spherical) -----------------------------------


def lonlat_to_webmerc(mt: Any, lon, lat):
    """(lon°, lat°) → (x, y) meters.  x = R·λ, y = R·ln tan(π/4 + φ/2)."""
    x = mt.radians(lon) * WGS84_A
    y = mt.log(mt.tan(mt.radians(lat) / 2.0 + math.pi / 4.0)) * WGS84_A
    return x, y


def webmerc_to_lonlat(mt: Any, x, y):
    lon = mt.degrees(x / WGS84_A)
    lat = mt.degrees(mt.atan(mt.exp(y / WGS84_A)) * 2.0 - math.pi / 2.0)
    return lon, lat


# ---- UTM (WGS84 ellipsoid, Snyder 1987 series) -----------------------------


def utm_central_meridian(zone: int) -> float:
    if not 1 <= zone <= 60:
        raise ValueError(f"UTM zone must be 1-60, got {zone}")
    return -183.0 + 6.0 * zone


def _meridian_arc(mt: Any, phi):
    e2 = WGS84_E2
    e4, e6 = e2 * e2, e2 * e2 * e2
    return WGS84_A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * mt.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * mt.sin(4 * phi)
        - (35 * e6 / 3072) * mt.sin(6 * phi)
    )


def lonlat_to_utm(mt: Any, lon, lat, zone: int, south: bool = False):
    """(lon°, lat°) → UTM (easting, northing) in zone ``zone``."""
    e2 = WGS84_E2
    ep2 = e2 / (1 - e2)
    phi = mt.radians(lat)
    lam = mt.radians(lon - utm_central_meridian(zone))
    sin_phi, cos_phi, tan_phi = mt.sin(phi), mt.cos(phi), mt.tan(phi)
    n = WGS84_A / mt.sqrt(1 - e2 * sin_phi * sin_phi)
    t = tan_phi * tan_phi
    c = ep2 * cos_phi * cos_phi
    a_ = lam * cos_phi
    m = _meridian_arc(mt, phi)
    a2, a3 = a_ * a_, a_ * a_ * a_
    a4, a5, a6 = a2 * a2, a2 * a3, a3 * a3
    x = UTM_K0 * n * (
        a_
        + (1 - t + c) * a3 / 6
        + (5 - 18 * t + t * t + 72 * c - 58 * ep2) * a5 / 120
    ) + UTM_FALSE_EASTING
    y = UTM_K0 * (
        m
        + n * tan_phi * (
            a2 / 2
            + (5 - t + 9 * c + 4 * c * c) * a4 / 24
            + (61 - 58 * t + t * t + 600 * c - 330 * ep2) * a6 / 720
        )
    )
    if south:
        y = y + UTM_FALSE_NORTHING_S
    return x, y


def utm_to_lonlat(mt: Any, x, y, zone: int, south: bool = False):
    """UTM (easting, northing) in zone ``zone`` → (lon°, lat°)."""
    e2 = WGS84_E2
    ep2 = e2 / (1 - e2)
    e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    x_ = x - UTM_FALSE_EASTING
    y_ = (y - UTM_FALSE_NORTHING_S) if south else y
    m = y_ / UTM_K0
    mu = m / (WGS84_A * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2**3 / 256))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * mt.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * mt.sin(4 * mu)
        + (151 * e1**3 / 96) * mt.sin(6 * mu)
        + (1097 * e1**4 / 512) * mt.sin(8 * mu)
    )
    sin1, cos1, tan1 = mt.sin(phi1), mt.cos(phi1), mt.tan(phi1)
    c1 = ep2 * cos1 * cos1
    t1 = tan1 * tan1
    n1 = WGS84_A / mt.sqrt(1 - e2 * sin1 * sin1)
    r1 = WGS84_A * (1 - e2) / (1 - e2 * sin1 * sin1) ** 1.5
    d = x_ / (n1 * UTM_K0)
    d2, d3 = d * d, d * d * d
    d4, d5, d6 = d2 * d2, d2 * d3, d3 * d3
    phi = phi1 - (n1 * tan1 / r1) * (
        d2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * d4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1)
        * d6 / 720
    )
    lam = (
        d
        - (1 + 2 * t1 + c1) * d3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1)
        * d5 / 120
    ) / cos1
    lon = utm_central_meridian(zone) + mt.degrees(lam)
    lat = mt.degrees(phi)
    return lon, lat


# ---- Azimuthal equidistant (Equi7-class; Snyder 1987 §25, spherical) -------

#: sphere radius for AEQD — the WGS84 semi-major axis, matching the
#: spherical reduction of the Equi7 PROJCS (reference pins its GDAL/osr
#: round-trip in tests/raster/test_gdal.py:7-18; this engine implements
#: the projection as math, not a GDAL shell-out)
AEQD_R = WGS84_A


def lonlat_to_aeqd(mt: Any, lon, lat, lat0: float, lon0: float,
                   fe: float = 0.0, fn: float = 0.0):
    """(lon°, lat°) → azimuthal-equidistant (x, y) meters about the
    center (lat0°, lon0°).  Distances from the center are true — the
    property Equi7 is built around."""
    phi0, phi = math.radians(lat0), mt.radians(lat)
    dlam = mt.radians(lon - lon0)
    sp0, cp0 = math.sin(phi0), math.cos(phi0)
    sp, cp = mt.sin(phi), mt.cos(phi)
    cos_c = sp0 * sp + cp0 * cp * mt.cos(dlam)
    # clamp rounding excursions outside [-1, 1] before acos-via-atan2
    cos_c = mt.where(cos_c > 1.0, 1.0, cos_c)
    cos_c = mt.where(cos_c < -1.0, -1.0, cos_c)
    sin_c = mt.sqrt(mt.where(cos_c * cos_c > 1.0, 0.0, 1.0 - cos_c * cos_c))
    c = mt.atan2(sin_c, cos_c)
    near0 = mt.abs(sin_c) < 1e-12
    # sin_c→0 happens at BOTH poles of the projection: the center (c=0,
    # k'→1) and the antipode (c=π, k'→∞, direction undefined — every
    # azimuth is equally true).  Forcing k'=1 there would alias the
    # antipode ONTO the center; emit NaN instead, matching proj's
    # undefined-point behavior.
    kp = mt.where(
        near0,
        mt.where(cos_c > 0.0, 1.0, float("nan")),
        c / mt.where(near0, 1.0, sin_c),
    )
    x = AEQD_R * kp * cp * mt.sin(dlam) + fe
    y = AEQD_R * kp * (cp0 * sp - sp0 * cp * mt.cos(dlam)) + fn
    return x, y


def aeqd_to_lonlat(mt: Any, x, y, lat0: float, lon0: float,
                   fe: float = 0.0, fn: float = 0.0):
    phi0 = math.radians(lat0)
    sp0, cp0 = math.sin(phi0), math.cos(phi0)
    x_, y_ = x - fe, y - fn
    rho = mt.sqrt(x_ * x_ + y_ * y_)
    c = rho / AEQD_R
    sc, cc = mt.sin(c), mt.cos(c)
    at_center = mt.abs(rho) < 1e-12
    rho_safe = mt.where(at_center, 1.0, rho)
    sin_phi = cc * sp0 + y_ * sc * cp0 / rho_safe
    sin_phi = mt.where(sin_phi > 1.0, 1.0, sin_phi)
    sin_phi = mt.where(sin_phi < -1.0, -1.0, sin_phi)
    phi = mt.asin(sin_phi)
    lam = mt.atan2(x_ * sc, rho_safe * cp0 * cc - y_ * sp0 * sc)
    # at the exact center rho=0: (lon0, lat0)
    lon = mt.where(at_center, lon0, lon0 + mt.degrees(lam))
    lat = mt.where(at_center, lat0, mt.degrees(phi))
    return lon, lat


def parse_wkt_projcs(wkt: str) -> dict | None:
    """Minimal WKT1 PROJCS reader for the projections this engine owns.
    Extracts PROJECTION + PARAMETER values; currently understands
    Azimuthal_Equidistant (the Equi7 family — reference
    tests/raster/test_gdal.py:7-18).  Returns a parse_sref-style dict or
    None."""
    import re

    if not wkt or not wkt.lstrip().upper().startswith("PROJCS"):
        return None
    proj = re.search(r'PROJECTION\["([^"]+)"\]', wkt)
    if proj is None:
        return None
    params = {
        k.lower(): float(v)
        for k, v in re.findall(
            r'PARAMETER\["([^"]+)",\s*([-+0-9.eE]+)\]', wkt
        )
    }
    name = proj.group(1).lower()
    if name in ("azimuthal_equidistant", "aeqd"):
        return {
            "kind": "aeqd",
            "lat0": params.get("latitude_of_center", 0.0),
            "lon0": params.get("longitude_of_center", 0.0),
            "fe": params.get("false_easting", 0.0),
            "fn": params.get("false_northing", 0.0),
        }
    return None


# ---- sref parsing + lon/lat hub --------------------------------------------


def parse_sref(sref: str) -> dict | None:
    """'EPSG:4326' / 'EPSG:3857' / 'EPSG:326xx' / 'EPSG:327xx', an
    AEQD PROJCS WKT, or the shorthand 'AEQD:lat0,lon0[,fe,fn]' →
    {'kind': ..., ...}; None when unknown."""
    if not sref:
        return None
    if sref.lstrip().upper().startswith("PROJCS"):
        return parse_wkt_projcs(sref)
    if sref.upper().startswith("AEQD:"):
        # contract: None when unknown/malformed (like the EPSG branch),
        # never a raw conversion error; lat0 AND lon0 are required
        try:
            vals = [float(v) for v in sref.split(":", 1)[1].split(",")]
        except ValueError:
            return None
        if len(vals) < 2 or len(vals) > 4:
            return None
        vals += [0.0] * (4 - len(vals))
        return {"kind": "aeqd", "lat0": vals[0], "lon0": vals[1],
                "fe": vals[2], "fn": vals[3]}
    if not sref.upper().startswith("EPSG:"):
        return None
    try:
        code = int(sref.split(":", 1)[1])
    except ValueError:
        return None
    if code == 4326:
        return {"kind": "lonlat"}
    if code == 3857:
        return {"kind": "webmerc"}
    if 32601 <= code <= 32660:
        return {"kind": "utm", "zone": code - 32600, "south": False}
    if 32701 <= code <= 32760:
        return {"kind": "utm", "zone": code - 32700, "south": True}
    return None


def to_lonlat(mt: Any, sref: dict, x, y):
    if sref["kind"] == "lonlat":
        return x, y
    if sref["kind"] == "webmerc":
        return webmerc_to_lonlat(mt, x, y)
    if sref["kind"] == "utm":
        return utm_to_lonlat(mt, x, y, sref["zone"], sref["south"])
    if sref["kind"] == "aeqd":
        return aeqd_to_lonlat(
            mt, x, y, sref["lat0"], sref["lon0"], sref["fe"], sref["fn"]
        )
    raise ValueError(f"unsupported sref {sref}")


def from_lonlat(mt: Any, sref: dict, lon, lat):
    if sref["kind"] == "lonlat":
        return lon, lat
    if sref["kind"] == "webmerc":
        return lonlat_to_webmerc(mt, lon, lat)
    if sref["kind"] == "utm":
        return lonlat_to_utm(mt, lon, lat, sref["zone"], sref["south"])
    if sref["kind"] == "aeqd":
        return lonlat_to_aeqd(
            mt, lon, lat, sref["lat0"], sref["lon0"], sref["fe"], sref["fn"]
        )
    raise ValueError(f"unsupported sref {sref}")


def transform(mt: Any, src_sref: str, dst_sref: str, x, y):
    """World coords in ``src_sref`` → ``dst_sref`` via the lon/lat hub.
    Raises when either sref is outside the supported set."""
    s, d = parse_sref(src_sref), parse_sref(dst_sref)
    if s is None or d is None:
        raise ValueError(
            f"unsupported CRS pair {src_sref!r} → {dst_sref!r}: supported "
            "are EPSG:4326, EPSG:3857, EPSG:326xx/327xx (UTM), and "
            "azimuthal-equidistant via PROJCS WKT or 'AEQD:lat0,lon0[,fe,fn]'"
        )
    lon, lat = to_lonlat(mt, s, x, y)
    return from_lonlat(mt, d, lon, lat)


def utm_zone_of(lon: float) -> int:
    """UTM zone containing longitude ``lon`` (degrees, [-180, 180))."""
    return int((lon + 180.0) // 6.0) % 60 + 1


def utm_epsg(lon: float, lat: float) -> str:
    """EPSG code string of the WGS84 UTM zone containing (lon, lat) —
    convenience for picking a dst sref from data extent."""
    zone = utm_zone_of(lon)
    return f"EPSG:{(32600 if lat >= 0 else 32700) + zone}"
