"""Pure-math CRS transforms: WGS84 lon/lat ↔ projected CRS families.

The reference delegates coordinate transforms to GDAL/osr
(gdalport.py:58-101; tests/test_gdal.py:21-49 round-trips Equi7).  This
engine implements the projection families a web-scale image corpus
actually declares — spherical Web Mercator (EPSG:3857), ellipsoidal
Transverse Mercator (WGS84 UTM zones EPSG:326xx/327xx plus arbitrary
WKT-parameterized TM), spherical Azimuthal Equidistant (the Equi7
family), ellipsoidal Lambert Conformal Conic (1SP/2SP, e.g. Lambert-93
EPSG:2154), ellipsoidal Lambert Azimuthal Equal-Area (e.g. ETRS89
LAEA Europe EPSG:3035), ellipsoidal Polar Stereographic (NSIDC sea-ice
grids EPSG:3413/3031), Albers Equal-Area Conic (NAD83 CONUS
EPSG:5070) and Sinusoidal (the MODIS grid), all Snyder 1987 formula
sets — as plain math over a swappable backend:

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
    pow = staticmethod(np.power)
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


# ---- ellipsoids ------------------------------------------------------------

#: named ellipsoids: (semi-major a, inverse flattening 1/f).  ETRS89 and
#: RGF93 sit on GRS80, which agrees with WGS84 to sub-mm in shape; this
#: engine applies no datum shift (both datums coincide with WGS84 at the
#: cm level, far below a web-scale tile's ground sampling distance).
ELLIPSOIDS = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    "Bessel": (6377397.155, 299.1528128),
}


def _wrap_lon(mt: Any, lon):
    """Fold a longitude that overflowed ±180 back into range.  The
    CONDITIONAL form leaves in-range values bit-identical (an
    unconditional modulo would perturb every value by fp rounding);
    overflow from an inverse projection is at most one revolution, so a
    single fold suffices.  Needed wherever lon = lon0 + δ can exceed
    range (polar stereographic, conic θ/n, azimuthal aspects) — review
    r5 pass-3 #1: an unwrapped −210° chained into a Δλ-linear
    projection (sinusoidal/Mercator) lands a world-width off."""
    return mt.where(
        lon > 180.0, lon - 360.0, mt.where(lon < -180.0, lon + 360.0, lon)
    )


def _e2_of(a: float, rf: float) -> float:
    """First eccentricity squared from inverse flattening (rf=0 →
    sphere)."""
    if rf == 0.0:
        return 0.0
    f = 1.0 / rf
    return f * (2.0 - f)


# ---- Transverse Mercator (ellipsoidal, Snyder 1987 §8 series) --------------
#
# Generalized over (a, e2, lat0, lon0, k0, fe, fn); the UTM zone
# functions below are thin wrappers.  The reference accepts arbitrary
# osr WKT (native/geotiff.py:151-186); these families cover the
# projections a real raster archive actually declares.


def utm_central_meridian(zone: int) -> float:
    if not 1 <= zone <= 60:
        raise ValueError(f"UTM zone must be 1-60, got {zone}")
    return -183.0 + 6.0 * zone


def _meridian_arc(mt: Any, phi, a: float = WGS84_A, e2: float = WGS84_E2):
    e4, e6 = e2 * e2, e2 * e2 * e2
    return a * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * mt.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * mt.sin(4 * phi)
        - (35 * e6 / 3072) * mt.sin(6 * phi)
    )


def _footpoint_latitude(mt: Any, m, a: float, e2: float):
    """Rectifying series (Snyder 3-26): meridian distance m → footpoint
    latitude φ₁ — shared by the TM and sinusoidal inverses."""
    e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    mu = m / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2**3 / 256))
    return (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * mt.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * mt.sin(4 * mu)
        + (151 * e1**3 / 96) * mt.sin(6 * mu)
        + (1097 * e1**4 / 512) * mt.sin(8 * mu)
    )


def lonlat_to_tmerc(mt: Any, lon, lat, p: dict):
    """(lon°, lat°) → Transverse Mercator (x, y) with parameters
    ``p = {a, e2, lat0, lon0, k0, fe, fn}``."""
    a, e2, k0 = p["a"], p["e2"], p["k0"]
    ep2 = e2 / (1 - e2)
    phi = mt.radians(lat)
    lam = mt.radians(lon - p["lon0"])
    sin_phi, cos_phi, tan_phi = mt.sin(phi), mt.cos(phi), mt.tan(phi)
    n = a / mt.sqrt(1 - e2 * sin_phi * sin_phi)
    t = tan_phi * tan_phi
    c = ep2 * cos_phi * cos_phi
    a_ = lam * cos_phi
    m = _meridian_arc(mt, phi, a, e2)
    m0 = _meridian_arc(math, math.radians(p["lat0"]), a, e2)
    a2, a3 = a_ * a_, a_ * a_ * a_
    a4, a5, a6 = a2 * a2, a2 * a3, a3 * a3
    x = k0 * n * (
        a_
        + (1 - t + c) * a3 / 6
        + (5 - 18 * t + t * t + 72 * c - 58 * ep2) * a5 / 120
    ) + p["fe"]
    y = k0 * (
        m - m0
        + n * tan_phi * (
            a2 / 2
            + (5 - t + 9 * c + 4 * c * c) * a4 / 24
            + (61 - 58 * t + t * t + 600 * c - 330 * ep2) * a6 / 720
        )
    ) + p["fn"]
    return x, y


def tmerc_to_lonlat(mt: Any, x, y, p: dict):
    """Transverse Mercator (x, y) → (lon°, lat°), parameters as in
    ``lonlat_to_tmerc``."""
    a, e2, k0 = p["a"], p["e2"], p["k0"]
    ep2 = e2 / (1 - e2)
    x_ = x - p["fe"]
    m0 = _meridian_arc(math, math.radians(p["lat0"]), a, e2)
    m = m0 + (y - p["fn"]) / k0
    phi1 = _footpoint_latitude(mt, m, a, e2)
    sin1, cos1, tan1 = mt.sin(phi1), mt.cos(phi1), mt.tan(phi1)
    c1 = ep2 * cos1 * cos1
    t1 = tan1 * tan1
    n1 = a / mt.sqrt(1 - e2 * sin1 * sin1)
    r1 = a * (1 - e2) / (1 - e2 * sin1 * sin1) ** 1.5
    d = x_ / (n1 * k0)
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
    lon = p["lon0"] + mt.degrees(lam)
    lat = mt.degrees(phi)
    return lon, lat


def _utm_params(zone: int, south: bool) -> dict:
    return {
        "a": WGS84_A, "e2": WGS84_E2, "lat0": 0.0,
        "lon0": utm_central_meridian(zone), "k0": UTM_K0,
        "fe": UTM_FALSE_EASTING,
        "fn": UTM_FALSE_NORTHING_S if south else 0.0,
    }


def lonlat_to_utm(mt: Any, lon, lat, zone: int, south: bool = False):
    """(lon°, lat°) → UTM (easting, northing) in zone ``zone``."""
    return lonlat_to_tmerc(mt, lon, lat, _utm_params(zone, south))


def utm_to_lonlat(mt: Any, x, y, zone: int, south: bool = False):
    """UTM (easting, northing) in zone ``zone`` → (lon°, lat°)."""
    return tmerc_to_lonlat(mt, x, y, _utm_params(zone, south))


# ---- Lambert Conformal Conic (ellipsoidal, Snyder 1987 §15) ----------------


def _lcc_consts(p: dict) -> tuple[float, float, float]:
    """Scalar setup: cone constant n, a·F·k0, and ρ0.  1SP when
    sp1 == sp2 (n = sin φ1); ``k0`` scales the 1SP form (2SP WKTs carry
    no scale_factor — k0 defaults to 1)."""
    a, e2 = p["a"], p["e2"]
    e = math.sqrt(e2)

    def t_of(phi_deg: float) -> float:
        phi = math.radians(phi_deg)
        s = e * math.sin(phi)
        return math.tan(math.pi / 4 - phi / 2) * ((1 + s) / (1 - s)) ** (e / 2)

    def m_of(phi_deg: float) -> float:
        phi = math.radians(phi_deg)
        return math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) ** 2)

    sp1, sp2 = p["sp1"], p["sp2"]
    t1, m1 = t_of(sp1), m_of(sp1)
    if abs(sp1 - sp2) < 1e-12:
        n = math.sin(math.radians(sp1))
    else:
        t2, m2 = t_of(sp2), m_of(sp2)
        n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    if abs(n) < 1e-12:
        # symmetric parallels (sp1 = -sp2) or sp1 = sp2 = 0 collapse the
        # cone to a cylinder (n → 0, Mercator limit) — out of LCC's
        # domain; fail the transform contract loudly, not with a 1/0
        raise ValueError(
            f"degenerate LCC cone: standard parallels ({sp1}, {sp2}) "
            "give cone constant n=0 (use Mercator for the cylindrical "
            "limit)"
        )
    f_ = m1 / (n * t1 ** n)
    afk = a * f_ * p["k0"]
    rho0 = afk * t_of(p["lat0"]) ** n
    return n, afk, rho0


def lonlat_to_lcc(mt: Any, lon, lat, p: dict):
    """(lon°, lat°) → Lambert Conformal Conic (x, y); parameters
    ``p = {a, e2, lat0, lon0, sp1, sp2, k0, fe, fn}``."""
    e = math.sqrt(p["e2"])
    n, afk, rho0 = _lcc_consts(p)
    phi = mt.radians(lat)
    s = e * mt.sin(phi)
    t = mt.tan(math.pi / 4 - phi / 2) * mt.pow((1 + s) / (1 - s), e / 2)
    rho = afk * mt.pow(t, n)
    theta = n * mt.radians(lon - p["lon0"])
    x = p["fe"] + rho * mt.sin(theta)
    y = p["fn"] + rho0 - rho * mt.cos(theta)
    return x, y


def _conformal_to_geodetic(mt: Any, chi, e2: float):
    """Conformal latitude χ → geodetic φ (Snyder eq. 3-5 series; error
    ~e⁸, far below 1e-6° for Earth ellipsoids)."""
    e4, e6, e8 = e2 * e2, e2 ** 3, e2 ** 4
    return (
        chi
        + (e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * mt.sin(2 * chi)
        + (7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * mt.sin(4 * chi)
        + (7 * e6 / 120 + 81 * e8 / 1120) * mt.sin(6 * chi)
        + (4279 * e8 / 161280) * mt.sin(8 * chi)
    )


def lcc_to_lonlat(mt: Any, x, y, p: dict):
    e2 = p["e2"]
    n, afk, rho0 = _lcc_consts(p)
    sgn = 1.0 if n >= 0 else -1.0
    x_, yr = x - p["fe"], rho0 - (y - p["fn"])
    rho = sgn * mt.sqrt(x_ * x_ + yr * yr)
    theta = mt.atan2(sgn * x_, sgn * yr)
    t = mt.pow(rho / afk, 1.0 / n)
    chi = math.pi / 2 - 2.0 * mt.atan(t)
    lat = mt.degrees(_conformal_to_geodetic(mt, chi, e2))
    lon = _wrap_lon(mt, p["lon0"] + mt.degrees(theta / n))
    return lon, lat


# ---- Lambert Azimuthal Equal-Area (ellipsoidal oblique, Snyder §24) --------


def _laea_q(mt: Any, sin_phi, e: float, e2: float):
    """Authalic q(φ) = (1−e²)[sinφ/(1−e²sin²φ) − ln((1−e·sinφ)/(1+e·sinφ))/(2e)]."""
    if e == 0.0:
        return 2.0 * sin_phi
    es = e * sin_phi
    return (1 - e2) * (
        sin_phi / (1 - e2 * sin_phi * sin_phi)
        - mt.log((1 - es) / (1 + es)) / (2 * e)
    )


def _laea_consts(p: dict) -> tuple[float, float, float, float]:
    """Scalar setup: (qp, β1, Rq, D) for the oblique/equatorial aspect.
    Polar aspects (|lat0| = 90) use a different formula set and raise."""
    a, e2 = p["a"], p["e2"]
    e = math.sqrt(e2)
    if abs(abs(p["lat0"]) - 90.0) < 1e-9:
        raise ValueError(
            "polar-aspect LAEA (lat0=±90) is not supported; supported "
            "aspects are oblique and equatorial"
        )
    qp = _laea_q(math, 1.0, e, e2)
    phi1 = math.radians(p["lat0"])
    q1 = _laea_q(math, math.sin(phi1), e, e2)
    beta1 = math.asin(min(1.0, max(-1.0, q1 / qp)))
    rq = a * math.sqrt(qp / 2.0)
    m1 = math.cos(phi1) / math.sqrt(1 - e2 * math.sin(phi1) ** 2)
    d = a * m1 / (rq * math.cos(beta1))
    return qp, beta1, rq, d


def lonlat_to_laea(mt: Any, lon, lat, p: dict):
    """(lon°, lat°) → Lambert Azimuthal Equal-Area (x, y); parameters
    ``p = {a, e2, lat0, lon0, fe, fn}``.  The antipode of the center has
    no finite image — emits NaN there (proj's undefined-point
    behavior, same convention as AEQD)."""
    e2 = p["e2"]
    e = math.sqrt(e2)
    qp, beta1, rq, d = _laea_consts(p)
    sb1, cb1 = math.sin(beta1), math.cos(beta1)
    phi = mt.radians(lat)
    q = _laea_q(mt, mt.sin(phi), e, e2)
    qr = q / qp
    qr = mt.where(qr > 1.0, 1.0, qr)
    qr = mt.where(qr < -1.0, -1.0, qr)
    beta = mt.asin(qr)
    sb, cb = mt.sin(beta), mt.cos(beta)
    lam = mt.radians(lon - p["lon0"])
    denom = 1.0 + sb1 * sb + cb1 * cb * mt.cos(lam)
    bad = mt.abs(denom) < 1e-12  # antipode: every direction equally true
    b = rq * mt.sqrt(2.0 / mt.where(bad, 1.0, denom))
    b = mt.where(bad, float("nan"), b)
    x = p["fe"] + b * d * cb * mt.sin(lam)
    y = p["fn"] + (b / d) * (cb1 * sb - sb1 * cb * mt.cos(lam))
    return x, y


def _authalic_to_geodetic(mt: Any, beta, e2: float):
    """Authalic latitude β → geodetic φ (Snyder eq. 3-18 series)."""
    e4, e6 = e2 * e2, e2 ** 3
    return (
        beta
        + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * mt.sin(2 * beta)
        + (23 * e4 / 360 + 251 * e6 / 3780) * mt.sin(4 * beta)
        + (761 * e6 / 45360) * mt.sin(6 * beta)
    )


def laea_to_lonlat(mt: Any, x, y, p: dict):
    e2 = p["e2"]
    qp, beta1, rq, d = _laea_consts(p)
    sb1, cb1 = math.sin(beta1), math.cos(beta1)
    x_, y_ = x - p["fe"], y - p["fn"]
    xd, yd = x_ / d, d * y_
    rho = mt.sqrt(xd * xd + yd * yd)
    at_center = mt.abs(rho) < 1e-12
    rho_safe = mt.where(at_center, 1.0, rho)
    sr = rho / (2.0 * rq)
    sr = mt.where(sr > 1.0, 1.0, sr)
    ce = 2.0 * mt.asin(sr)
    sc, cc = mt.sin(ce), mt.cos(ce)
    qr = cc * sb1 + d * y_ * sc * cb1 / rho_safe
    qr = mt.where(qr > 1.0, 1.0, qr)
    qr = mt.where(qr < -1.0, -1.0, qr)
    beta = mt.asin(qr)
    lam = mt.atan2(x_ * sc, d * rho_safe * cb1 * cc - d * d * y_ * sb1 * sc)
    phi = _authalic_to_geodetic(mt, beta, e2)
    lon = mt.where(
        at_center, p["lon0"], _wrap_lon(mt, p["lon0"] + mt.degrees(lam))
    )
    lat = mt.where(at_center, p["lat0"], mt.degrees(phi))
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
    lon = mt.where(at_center, lon0, _wrap_lon(mt, lon0 + mt.degrees(lam)))
    lat = mt.where(at_center, lat0, mt.degrees(phi))
    return lon, lat


def _parse_towgs84(wkt: str) -> tuple | None:
    """WKT1 ``TOWGS84[dx,dy,dz[,rx,ry,rz,ds]]`` → 7-tuple (3-parameter
    form zero-padded); None when absent."""
    import re

    m = re.search(r'TOWGS84\[([^\]]+)\]', wkt)
    if m is None:
        return None
    try:
        vals = [float(v) for v in m.group(1).split(",")]
    except ValueError:
        vals = None
    if vals is None or len(vals) not in (3, 7):
        # a PRESENT but malformed clause must fail loudly — silently
        # skipping it would drop a ~100-250 m datum shift (review r5
        # pass-3 #3; same policy as degenerate cones)
        raise ValueError(f"malformed TOWGS84 clause: {m.group(0)!r}")
    vals += [0.0] * (7 - len(vals))
    return tuple(vals)


def _check_geogcs_conventions(wkt: str) -> None:
    """Reject non-Greenwich prime meridians and non-degree angular
    units LOUDLY — silently discarding a PRIMEM["Paris",2.337...] would
    shift every longitude ~170 km (review r5 pass-3 #4).  Lenient when
    the clauses are absent or unparseable (plain Greenwich/degree WKTs
    in the wild frequently omit the unit factor)."""
    import re

    pm = re.search(r'PRIMEM\["([^"]*)",\s*([-+0-9.eE]+)', wkt)
    if pm is not None and abs(float(pm.group(2))) > 1e-12:
        raise ValueError(
            f"non-Greenwich prime meridian {pm.group(1)!r} "
            f"({pm.group(2)}°) is not supported"
        )
    # the angular UNIT is the first UNIT after the GEOGCS token (WKT1
    # nests GEOGCS before PROJECTION/linear-UNIT); anchoring on PRIMEM's
    # closing bracket misses the common GDAL shape where PRIMEM carries
    # a nested AUTHORITY[...] clause (ADVICE r5 #2).  The search must
    # stop at the PROJECTION token: when the GEOGCS omits its UNIT, the
    # next UNIT in the document is the PROJCS LINEAR one ("metre") and
    # matching it would falsely reject a valid WKT (review r6 #2).
    up = wkt.upper()
    g = up.find("GEOGCS")
    end = up.find("PROJECTION", g) if g >= 0 else -1
    un = (
        re.search(
            r'UNIT\["([^"]*)",\s*([-+0-9.eE]+)',
            wkt[g:end] if end >= 0 else wkt[g:],
        )
        if g >= 0 else None
    )
    if un is not None:
        if abs(float(un.group(2)) - 0.0174532925199433) > 1e-9:
            raise ValueError(
                f"angular unit {un.group(1)!r} (factor {un.group(2)}) is "
                "not degrees; only degree-based geographic CRSs are "
                "supported"
            )


def parse_wkt_projcs(wkt: str) -> dict | None:
    """WKT1 PROJCS reader for the projections this engine owns: the
    Azimuthal_Equidistant (Equi7) family — reference
    tests/raster/test_gdal.py:7-18 — plus ellipsoidal
    Transverse_Mercator, Lambert_Conformal_Conic (1SP & 2SP) and
    Lambert_Azimuthal_Equal_Area, the families covering the vast
    majority of real-world EPSG codes.  The ellipsoid (a, 1/f) is read
    from the SPHEROID node.  Returns a parse_sref-style dict or None."""
    import re

    if not wkt or not wkt.lstrip().upper().startswith("PROJCS"):
        return None
    _check_geogcs_conventions(wkt)
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
    sph = re.search(
        r'SPHEROID\["[^"]*",\s*([-+0-9.eE]+),\s*([-+0-9.eE]+)', wkt
    )
    a, rf = (float(sph.group(1)), float(sph.group(2))) if sph else ELLIPSOIDS["WGS84"]
    base = {"a": a, "e2": _e2_of(a, rf)}
    tw = _parse_towgs84(wkt)
    if tw is not None:
        base["towgs84"] = tw
    # GDAL emits latitude_of_origin/central_meridian for these families;
    # esri-style WKTs use latitude_of_center/longitude_of_center — accept
    # either spelling
    lat0 = params.get("latitude_of_origin", params.get("latitude_of_center", 0.0))
    lon0 = params.get("central_meridian", params.get("longitude_of_center", 0.0))
    fe = params.get("false_easting", 0.0)
    fn = params.get("false_northing", 0.0)
    if name == "transverse_mercator":
        return {"kind": "tmerc", **base, "lat0": lat0, "lon0": lon0,
                "k0": params.get("scale_factor", 1.0), "fe": fe, "fn": fn}
    if name in ("lambert_conformal_conic", "lambert_conformal_conic_2sp",
                "lambert_conformal_conic_1sp"):
        sp1 = params.get("standard_parallel_1", lat0)
        sp2 = params.get("standard_parallel_2", sp1)
        return {"kind": "lcc", **base, "lat0": lat0, "lon0": lon0,
                "sp1": sp1, "sp2": sp2,
                "k0": params.get("scale_factor", 1.0), "fe": fe, "fn": fn}
    if name == "lambert_azimuthal_equal_area":
        return {"kind": "laea", **base, "lat0": lat0, "lon0": lon0,
                "fe": fe, "fn": fn}
    if name == "polar_stereographic":
        # GDAL WKT1: latitude_of_origin IS the standard parallel
        # (latitude of true scale), signed — negative = south aspect
        ts = params.get("standard_parallel_1", lat0)
        return {"kind": "stere", **base, "lat_ts": ts, "lon0": lon0,
                "k0": params.get("scale_factor", 1.0), "fe": fe, "fn": fn}
    if name in ("albers_conic_equal_area", "albers"):
        sp1 = params.get("standard_parallel_1", lat0)
        sp2 = params.get("standard_parallel_2", sp1)
        return {"kind": "aea", **base, "lat0": lat0, "lon0": lon0,
                "sp1": sp1, "sp2": sp2, "fe": fe, "fn": fn}
    if name == "sinusoidal":
        return {"kind": "sinu", **base, "lon0": lon0, "fe": fe, "fn": fn}
    if name in ("mercator_1sp", "mercator"):
        if params.get("scale_factor", 1.0) == 0.0:
            raise ValueError("Mercator_1SP: scale_factor=0 is degenerate")
        # ESRI writes variant B as bare PROJECTION["Mercator"] with a
        # standard_parallel_1 — honour it as the 2SP (true-scale) form;
        # dropping it would scale every coordinate by 1/m(sp1) silently
        # (review r6 #4).  An explicit non-unit scale_factor alongside
        # it is contradictory (the two variants define scale
        # differently) — fail loudly.
        sp1 = params.get("standard_parallel_1")
        if sp1 is not None and name == "mercator":
            if params.get("scale_factor", 1.0) != 1.0:
                raise ValueError(
                    "Mercator: both standard_parallel_1 and a non-unit "
                    "scale_factor given — ambiguous variant"
                )
            if abs(abs(sp1) - 90.0) < 1e-9:
                raise ValueError("Mercator: standard parallel at a pole "
                                 "is degenerate")
            return {"kind": "merc", **base, "lat_ts": sp1, "lon0": lon0,
                    "k0": 1.0, "fe": fe, "fn": fn}
        return {"kind": "merc", **base, "lat_ts": 0.0, "lon0": lon0,
                "k0": params.get("scale_factor", 1.0), "fe": fe, "fn": fn}
    if name == "mercator_2sp":
        ts = params.get("standard_parallel_1", lat0)
        if abs(abs(ts) - 90.0) < 1e-9:
            raise ValueError("Mercator_2SP: standard parallel at a pole "
                             "is degenerate")
        return {"kind": "merc", **base, "lat_ts": ts, "lon0": lon0,
                "k0": 1.0, "fe": fe, "fn": fn}
    if name in ("equirectangular", "equidistant_cylindrical",
                "plate_carree"):
        ts = params.get("standard_parallel_1", lat0)
        if abs(abs(ts) - 90.0) < 1e-9:
            # cos(90°) only survives as ~4e-10 float error — the inverse
            # would divide by it and return garbage longitudes (ADVICE r6)
            raise ValueError("Equirectangular: standard parallel at a "
                             "pole is degenerate")
        return {"kind": "eqc", **base, "lat_ts": ts, "lon0": lon0,
                "fe": fe, "fn": fn}
    if name in ("hotine_oblique_mercator", "oblique_mercator",
                "hotine_oblique_mercator_azimuth_center",
                "hotine_oblique_mercator_azimuth_natural_origin",
                "rectified_skew_orthomorphic_natural_origin",
                "rectified_skew_orthomorphic_center"):
        # GDAL: Hotine_Oblique_Mercator = variant A (9812, FE/FN at the
        # natural origin); *_Azimuth_Center = variant B (9815, Ec/Nc at
        # the projection center).  RSO and *_Azimuth_Natural_Origin
        # spellings are ESRI aliases.
        variant = "B" if name.endswith("center") else "A"
        if "azimuth" not in params:
            raise ValueError(
                "Hotine oblique Mercator WKT lacks the azimuth parameter"
            )
        alpha = params["azimuth"]
        return {"kind": "hom", **base, "variant": variant,
                "lat0": lat0, "lonc": lon0, "alpha": alpha,
                "gamma": params.get("rectified_grid_angle", alpha),
                "k0": params.get("scale_factor", 1.0), "fe": fe, "fn": fn}
    if name in ("krovak", "krovak_east_north"):
        # ESRI WKTs carry an axis-flip triplet applied to the native
        # (southing, westing) output: rotate 90° then scale.  Only the
        # east-north result (EPSG 1041, what EPSG:5514 uses) is
        # supported, and with rotation 90 that requires SIGN-OPPOSED
        # scales — S-JTSK_Krovak_East_North ships (-1, 1, 90) (review
        # r7 #1: the previously-accepted (-1, -1, 90) cannot denote
        # east-north under any rotation sense and would have been
        # interpreted with one axis sign wrong).  Anything else raises
        # loudly instead of flipping silently.
        xs = params.get("x_scale", -1.0)
        ys = params.get("y_scale", 1.0)
        rot = params.get("xy_plane_rotation", 90.0)
        if (xs, ys, rot) != (-1.0, 1.0, 90.0):
            raise ValueError(
                "Krovak: only the east-north axis convention is "
                "supported (X_Scale=-1, Y_Scale=1, XY_Plane_Rotation="
                f"90), got ({xs}, {ys}, {rot})"
            )
        if abs(params.get("azimuth", 0.0)) < 1e-12:
            raise ValueError("Krovak WKT lacks the azimuth parameter")
        return {"kind": "krovak", **base, "lat0": lat0, "lon0": lon0,
                "alpha": params["azimuth"],
                "lat_p": params.get("pseudo_standard_parallel_1", 78.5),
                "k0": params.get("scale_factor", 0.9999),
                "fe": fe, "fn": fn}
    return None


# ---- Polar Stereographic (ellipsoidal, Snyder 1987 §21) --------------------


def _ps_consts(p: dict) -> tuple[float, float, float]:
    """Scalar setup for the polar aspect: (e, sign, ρ/t coefficient).
    ``lat_ts`` is the latitude of true scale (standard parallel); when
    |lat_ts| = 90 the scale factor k0 applies at the pole instead
    (Snyder 21-33 vs 21-34)."""
    a, e2 = p["a"], p["e2"]
    e = math.sqrt(e2)
    south = p["lat_ts"] < 0 or (p["lat_ts"] == 0 and p.get("south", False))
    sgn = -1.0 if south else 1.0
    ts_abs = abs(p["lat_ts"])
    if abs(ts_abs - 90.0) < 1e-9:
        # k0 at the pole: rho = 2 a k0 t / sqrt((1+e)^(1+e) (1-e)^(1-e))
        coef = (
            2.0 * a * p.get("k0", 1.0)
            / math.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))
        )
    else:
        phi_c = math.radians(ts_abs)
        s = e * math.sin(phi_c)
        t_c = math.tan(math.pi / 4 - phi_c / 2) * ((1 + s) / (1 - s)) ** (e / 2)
        m_c = math.cos(phi_c) / math.sqrt(1 - e2 * math.sin(phi_c) ** 2)
        coef = a * m_c / t_c  # rho = coef * t  (true scale at lat_ts)
    return e, sgn, coef


def lonlat_to_stere(mt: Any, lon, lat, p: dict):
    """(lon°, lat°) → polar stereographic (x, y); parameters
    ``p = {a, e2, lat_ts, lon0, k0, fe, fn}`` (lat_ts signed: negative =
    south polar aspect)."""
    e, sgn, coef = _ps_consts(p)
    phi = mt.radians(lat * sgn)  # fold the south aspect onto the north
    lam = mt.radians((lon - p["lon0"]) * sgn)
    s = e * mt.sin(phi)
    t = mt.tan(math.pi / 4 - phi / 2) * mt.pow((1 + s) / (1 - s), e / 2)
    rho = coef * t
    # north aspect: x = fe + ρ sin λ', y = fn − ρ cos λ'; the south
    # aspect folds through (−lat, −λ') with both axes mirrored
    x = p["fe"] + sgn * rho * mt.sin(lam)
    y = p["fn"] - sgn * rho * mt.cos(lam)
    return x, y


def stere_to_lonlat(mt: Any, x, y, p: dict):
    e, sgn, coef = _ps_consts(p)
    e2 = p["e2"]
    x_ = (x - p["fe"]) * sgn
    y_ = (y - p["fn"]) * sgn
    rho = mt.sqrt(x_ * x_ + y_ * y_)
    t = rho / coef
    chi = math.pi / 2 - 2.0 * mt.atan(t)
    phi = _conformal_to_geodetic(mt, chi, e2)
    at_pole = mt.abs(rho) < 1e-12
    lam = mt.atan2(x_, 0.0 - y_)
    lon = mt.where(
        at_pole, p["lon0"],
        _wrap_lon(mt, p["lon0"] + sgn * mt.degrees(lam)),
    )
    lat = sgn * mt.where(at_pole, 90.0, mt.degrees(phi))
    return lon, lat


# ---- Albers Equal-Area Conic (ellipsoidal, Snyder 1987 §14) ----------------


def _aea_consts(p: dict) -> tuple[float, float, float, float]:
    """Scalar setup: (e, n, C, ρ0) from the two standard parallels."""
    a, e2 = p["a"], p["e2"]
    e = math.sqrt(e2)

    def m_of(phi_deg: float) -> float:
        phi = math.radians(phi_deg)
        return math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) ** 2)

    def q_of(phi_deg: float) -> float:
        return _laea_q(math, math.sin(math.radians(phi_deg)), e, e2)

    sp1, sp2 = p["sp1"], p["sp2"]
    m1, q1 = m_of(sp1), q_of(sp1)
    if abs(sp1 - sp2) < 1e-12:
        n = math.sin(math.radians(sp1))
    else:
        m2, q2 = m_of(sp2), q_of(sp2)
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
    if abs(n) < 1e-12:
        raise ValueError(
            f"degenerate Albers cone: standard parallels ({sp1}, {sp2}) "
            "give cone constant n=0 (use cylindrical equal-area for the "
            "limit)"
        )
    c = m1 * m1 + n * q1
    rho0 = a * math.sqrt(max(c - n * q_of(p["lat0"]), 0.0)) / n
    return e, n, c, rho0


def lonlat_to_aea(mt: Any, lon, lat, p: dict):
    """(lon°, lat°) → Albers equal-area conic (x, y); parameters
    ``p = {a, e2, lat0, lon0, sp1, sp2, fe, fn}``."""
    a, e2 = p["a"], p["e2"]
    e, n, c, rho0 = _aea_consts(p)
    phi = mt.radians(lat)
    q = _laea_q(mt, mt.sin(phi), e, e2)
    inner = c - n * q
    inner = mt.where(inner < 0.0, 0.0, inner)
    rho = a * mt.sqrt(inner) / n
    theta = n * mt.radians(lon - p["lon0"])
    x = p["fe"] + rho * mt.sin(theta)
    y = p["fn"] + rho0 - rho * mt.cos(theta)
    return x, y


def aea_to_lonlat(mt: Any, x, y, p: dict):
    a, e2 = p["a"], p["e2"]
    e, n, c, rho0 = _aea_consts(p)
    sgn = 1.0 if n >= 0 else -1.0
    x_, yr = x - p["fe"], rho0 - (y - p["fn"])
    rho = sgn * mt.sqrt(x_ * x_ + yr * yr)
    theta = mt.atan2(sgn * x_, sgn * yr)
    q = (c - (rho * n / a) * (rho * n / a)) / n
    qp = _laea_q(math, 1.0, e, e2)
    qr = q / qp
    qr = mt.where(qr > 1.0, 1.0, qr)
    qr = mt.where(qr < -1.0, -1.0, qr)
    beta = mt.asin(qr)
    lat = mt.degrees(_authalic_to_geodetic(mt, beta, e2))
    lon = _wrap_lon(mt, p["lon0"] + mt.degrees(theta / n))
    return lon, lat


# ---- Sinusoidal (Snyder 1987 §30; the MODIS grid is the spherical case) ----


def lonlat_to_sinu(mt: Any, lon, lat, p: dict):
    """(lon°, lat°) → sinusoidal (x, y); equal-area, ellipsoidal:
    x = a·Δλ·cosφ/√(1−e²sin²φ), y = M(φ).  ``p = {a, e2, lon0, fe, fn}``
    (MODIS uses the SPHERE a = 6371007.181, e2 = 0 — same formulas)."""
    a, e2 = p["a"], p["e2"]
    phi = mt.radians(lat)
    lam = mt.radians(lon - p["lon0"])
    sp = mt.sin(phi)
    x = p["fe"] + a * lam * mt.cos(phi) / mt.sqrt(1 - e2 * sp * sp)
    y = p["fn"] + _meridian_arc(mt, phi, a, e2)
    return x, y


def sinu_to_lonlat(mt: Any, x, y, p: dict):
    """Inverse via the footpoint-latitude series (same rectifying series
    as the TM inverse — Snyder 3-26)."""
    a, e2 = p["a"], p["e2"]
    phi = _footpoint_latitude(mt, y - p["fn"], a, e2)
    sp = mt.sin(phi)
    cp = mt.cos(phi)
    near_pole = mt.abs(cp) < 1e-12
    denom = a * mt.where(near_pole, 1.0, cp) / mt.sqrt(1 - e2 * sp * sp)
    lam = (x - p["fe"]) / denom
    # fold through _wrap_lon like every other inverse: an out-of-domain
    # x must not land a world-width off when chained (ADVICE r5 #3)
    lon = mt.where(
        near_pole, p["lon0"], _wrap_lon(mt, p["lon0"] + mt.degrees(lam))
    )
    lat = mt.degrees(phi)
    return lon, lat


# ---- Mercator 1SP/2SP (ellipsoidal, Snyder 1987 §7) ------------------------
#
# EPSG:3395 (World Mercator, variant A: k0 explicit) and the variant-B
# parameterization (true scale at a standard parallel lat_ts).  The
# reference reaches these through GDAL/osr (native/geotiff.py:151-186);
# here the closed forms run as Column math.  Web Mercator stays the
# separate spherical fast path (lonlat_to_webmerc).


def _merc_k0eff(p: dict) -> float:
    """Effective scale: k0·m(lat_ts) — variant A has lat_ts=0 (m=1),
    variant B carries no k0 (defaults 1) and true scale at lat_ts
    (EPSG method 9805: k0 = cosφ1/√(1−e²sin²φ1))."""
    e2 = p["e2"]
    phi1 = math.radians(p.get("lat_ts", 0.0))
    m1 = math.cos(phi1) / math.sqrt(1 - e2 * math.sin(phi1) ** 2)
    return p.get("k0", 1.0) * m1


def lonlat_to_merc(mt: Any, lon, lat, p: dict):
    """(lon°, lat°) → ellipsoidal Mercator (x, y);
    ``p = {a, e2, lat_ts, lon0, k0, fe, fn}``.  Poles map to ±inf (the
    projection's own domain limit), matching GDAL behavior."""
    a, e2 = p["a"], p["e2"]
    e = math.sqrt(e2)
    ak = a * _merc_k0eff(p)
    phi = mt.radians(lat)
    s = e * mt.sin(phi)
    t = mt.tan(math.pi / 4 - phi / 2) * mt.pow((1 + s) / (1 - s), e / 2)
    x = p["fe"] + ak * mt.radians(_wrap_lon(mt, lon - p["lon0"]))
    y = p["fn"] - ak * mt.log(t)
    return x, y


def merc_to_lonlat(mt: Any, x, y, p: dict):
    """Inverse via the conformal-latitude series (Snyder 7-13 / 3-5)."""
    ak = p["a"] * _merc_k0eff(p)
    t = mt.exp(-(y - p["fn"]) / ak)
    chi = math.pi / 2 - 2.0 * mt.atan(t)
    lat = mt.degrees(_conformal_to_geodetic(mt, chi, p["e2"]))
    lon = _wrap_lon(mt, p["lon0"] + mt.degrees((x - p["fe"]) / ak))
    return lon, lat


# ---- Equirectangular / Equidistant Cylindrical (EPSG method 1028) ----------
#
# EPSG:4087 (WGS 84 / World Equidistant Cylindrical) and the deprecated
# EPSG:32662 Plate Carrée alias.  x is linear in λ at the lat_ts
# parallel's transverse radius, y is the true meridian arc — the same
# _meridian_arc/_footpoint_latitude pair the TM and sinusoidal paths use.


def _eqc_nu1cos(p: dict) -> float:
    e2 = p["e2"]
    phi1 = math.radians(p.get("lat_ts", 0.0))
    return p["a"] * math.cos(phi1) / math.sqrt(1 - e2 * math.sin(phi1) ** 2)


def lonlat_to_eqc(mt: Any, lon, lat, p: dict):
    """(lon°, lat°) → equidistant cylindrical (x, y);
    ``p = {a, e2, lat_ts, lon0, fe, fn}``."""
    x = p["fe"] + _eqc_nu1cos(p) * mt.radians(_wrap_lon(mt, lon - p["lon0"]))
    y = p["fn"] + _meridian_arc(mt, mt.radians(lat), p["a"], p["e2"])
    return x, y


def eqc_to_lonlat(mt: Any, x, y, p: dict):
    phi = _footpoint_latitude(mt, y - p["fn"], p["a"], p["e2"])
    lon = _wrap_lon(
        mt, p["lon0"] + mt.degrees((x - p["fe"]) / _eqc_nu1cos(p))
    )
    return lon, mt.degrees(phi)


# ---- Hotine Oblique Mercator (EPSG methods 9812 / 9815) --------------------
#
# The oblique-aspect conformal cylindrical used where a country's extent
# runs diagonally: Malaysian RSO (EPSG:3375/29873), Alaska zone 1
# (EPSG:26731) and — via the αc=γc=90° aspect — the Swiss oblique
# projections.  Formulas are the EPSG Guidance Note 7-2 form of Snyder
# 1987 §9 (hyperbolic identities expanded so only exp/log/atan2 are
# needed — the same primitive set both backends share).  Variant A
# (9812) anchors FE/FN at the natural origin of the (u,v) axes; variant
# B (9815) anchors Ec/Nc at the projection CENTER by subtracting the
# center's u-coordinate uc.


def _hom_consts(p: dict) -> dict:
    """Scalar setup: aposphere constants (B, A), initial-line anchors
    (t0, D, F, H, G), rotation angles (γ0, λ0) and the variant-B center
    offset uc — all Python floats, shared by both backends and by the
    forward and inverse."""
    a, e2 = p["a"], p["e2"]
    e = math.sqrt(e2)
    phic = math.radians(p["lat0"])
    if abs(abs(p["lat0"]) - 90.0) < 1e-9:
        raise ValueError("Hotine oblique Mercator: latitude of center at "
                         "a pole is degenerate (use polar stereographic)")
    alphac = math.radians(p["alpha"])
    gammac = math.radians(p.get("gamma", p["alpha"]))
    sphi, cphi = math.sin(phic), math.cos(phic)
    B = math.sqrt(1.0 + e2 * cphi ** 4 / (1.0 - e2))
    A = a * B * p["k0"] * math.sqrt(1.0 - e2) / (1.0 - e2 * sphi * sphi)
    t0 = math.tan(math.pi / 4 - phic / 2) / (
        (1.0 - e * sphi) / (1.0 + e * sphi)
    ) ** (e / 2.0)
    D = B * math.sqrt(1.0 - e2) / (cphi * math.sqrt(1.0 - e2 * sphi * sphi))
    D2 = max(D * D, 1.0)  # EPSG: clamp |D|<1 (near-equator centers) to 1
    sgn = 1.0 if p["lat0"] >= 0 else -1.0
    Fc = D + math.sqrt(D2 - 1.0) * sgn
    H = Fc * t0 ** B
    G = (Fc - 1.0 / Fc) / 2.0
    s_g0 = math.sin(alphac) / D
    if abs(s_g0) > 1.0:
        raise ValueError(
            f"Hotine oblique Mercator: azimuth {p['alpha']}° is "
            f"inconsistent with latitude of center {p['lat0']}° "
            "(sin(azimuth)/D > 1)"
        )
    gamma0 = math.asin(s_g0)
    gl = G * math.tan(gamma0)
    if abs(gl) > 1.0:
        raise ValueError("Hotine oblique Mercator: degenerate initial "
                         "line (G·tanγ0 > 1)")
    lam0 = math.radians(p["lonc"]) - math.asin(gl) / B
    if abs(abs(p["alpha"]) - 90.0) < 1e-9:
        # EPSG GN7-2 special case: at αc = ±90° (the EOV / Swiss aspect)
        # uc = A·(λc − λ0) by definition.  Note this is a CONVENTION
        # pin, not a center-exactness guarantee: the per-point forward
        # keeps the general aposphere u, so the projection center lands
        # within ~5 cm of (Ec, Nc) for EOV-class grids (for αc ≠ 90°
        # the generic identity below IS exact at the center).
        uc = A * (math.radians(p["lonc"]) - lam0)
    else:
        uc = (A / B) * math.atan2(math.sqrt(D2 - 1.0),
                                  math.cos(alphac)) * sgn
    return {
        "B": B, "A": A, "H": H, "gamma0": gamma0, "lam0": lam0,
        "gammac": gammac, "uc": uc, "sgn": sgn, "e": e,
    }


def lonlat_to_hom(mt: Any, lon, lat, p: dict):
    """(lon°, lat°) → Hotine oblique Mercator (x, y);
    ``p = {a, e2, lat0, lonc, alpha[, gamma], k0, fe, fn, variant}``
    with ``variant`` "A" (9812) or "B" (9815)."""
    c = _hom_consts(p)
    B, A, H = c["B"], c["A"], c["H"]
    e = c["e"]
    phi = mt.radians(lat)
    s = e * mt.sin(phi)
    t = mt.tan(math.pi / 4 - phi / 2) * mt.pow((1.0 + s) / (1.0 - s), e / 2.0)
    Q = H / mt.pow(t, B)
    S = (Q - 1.0 / Q) / 2.0
    T = (Q + 1.0 / Q) / 2.0
    dl = mt.radians(_wrap_lon(mt, lon - math.degrees(c["lam0"])))
    V = mt.sin(B * dl)
    cg0, sg0 = math.cos(c["gamma0"]), math.sin(c["gamma0"])
    U = (-V * cg0 + S * sg0) / T
    v = A * mt.log((1.0 - U) / (1.0 + U)) / (2.0 * B)
    u = A * mt.atan2(S * cg0 + V * sg0, mt.cos(B * dl)) / B
    if p["variant"] == "B":
        u = u - abs(c["uc"]) * c["sgn"]
    cgc, sgc = math.cos(c["gammac"]), math.sin(c["gammac"])
    x = p["fe"] + v * cgc + u * sgc
    y = p["fn"] + u * cgc - v * sgc
    return x, y


def hom_to_lonlat(mt: Any, x, y, p: dict):
    """Inverse via the conformal-latitude series (Snyder 3-5)."""
    c = _hom_consts(p)
    B, A, H = c["B"], c["A"], c["H"]
    cgc, sgc = math.cos(c["gammac"]), math.sin(c["gammac"])
    dx, dy = x - p["fe"], y - p["fn"]
    v = dx * cgc - dy * sgc
    u = dy * cgc + dx * sgc
    if p["variant"] == "B":
        u = u + abs(c["uc"]) * c["sgn"]
    Q = mt.exp(-B * v / A)
    S = (Q - 1.0 / Q) / 2.0
    T = (Q + 1.0 / Q) / 2.0
    V = mt.sin(B * u / A)
    cg0, sg0 = math.cos(c["gamma0"]), math.sin(c["gamma0"])
    U = (V * cg0 + S * sg0) / T
    t = mt.pow(H / mt.sqrt((1.0 + U) / (1.0 - U)), 1.0 / B)
    chi = math.pi / 2 - 2.0 * mt.atan(t)
    lat = mt.degrees(_conformal_to_geodetic(mt, chi, p["e2"]))
    lam = c["lam0"] - mt.atan2(S * cg0 - V * sg0, mt.cos(B * u / A)) / B
    return _wrap_lon(mt, mt.degrees(lam)), lat


# ---- Krovak oblique conformal conic (EPSG method 9819) ---------------------
#
# The S-JTSK national projection of Czechia/Slovakia: a conformal conic
# on an oblique aspect via the Gaussian (conformal) sphere.  Pinned to
# the EPSG GN7-2 worked example (φ=50°12'32.4416"N, λ=16°50'59.1790"E
# Greenwich → southing 1050538.643, westing 568990.997 — mm-exact, see
# test_crs.py) and cross-checked against PROJ's east-north outputs for
# EPSG:5514 (the "Krovak East North" axis convention: E = −westing,
# N = −southing).  λ0 is Greenwich-referenced and used AS the EPSG
# value 24°50' (the registry's Ferro annotation is already folded into
# that number — the same reading PROJ's +lon_0=24.8333… takes; V is
# measured as B·(λ0 − λ) so the country lies at positive westing).


def _krovak_consts(p: dict) -> dict:
    a, e2 = p["a"], p["e2"]
    e = math.sqrt(e2)
    if abs(abs(p["lat0"]) - 90.0) < 1e-9:
        raise ValueError("Krovak: latitude of center at a pole is "
                         "degenerate")
    if abs(abs(p["lat_p"]) - 90.0) < 1e-9 or abs(p["lat_p"]) < 1e-9:
        raise ValueError("Krovak: pseudo standard parallel at a pole or "
                         "the equator is degenerate")
    if p["k0"] == 0.0:
        raise ValueError("Krovak: scale_factor=0 is degenerate")
    phic = math.radians(p["lat0"])
    phip = math.radians(p["lat_p"])
    sphi = math.sin(phic)
    A_ = a * math.sqrt(1.0 - e2) / (1.0 - e2 * sphi * sphi)
    B_ = math.sqrt(1.0 + e2 * math.cos(phic) ** 4 / (1.0 - e2))
    g0 = math.asin(sphi / B_)
    t0 = (
        math.tan(math.pi / 4 + g0 / 2)
        * ((1.0 + e * sphi) / (1.0 - e * sphi)) ** (e * B_ / 2.0)
        / math.tan(math.pi / 4 + phic / 2) ** B_
    )
    n = math.sin(phip)
    r0 = p["k0"] * A_ / math.tan(phip)
    rt = r0 * math.tan(math.pi / 4 + phip / 2) ** n
    return {"e": e, "A": A_, "B": B_, "t0": t0, "n": n, "rt": rt,
            "alphac": math.radians(p["alpha"]),
            "lam0": math.radians(p["lon0"])}


def lonlat_to_krovak(mt: Any, lon, lat, p: dict):
    """(lon°, lat°) → Krovak EAST-NORTH (EPSG 1041 axes: E = fe − Y
    westing, N = fn − X southing; EPSG:5514 has fe = fn = 0 so both
    coordinates are negative over the projection's service area)."""
    c = _krovak_consts(p)
    e, B_, n = c["e"], c["B"], c["n"]
    ca, sa = math.cos(c["alphac"]), math.sin(c["alphac"])
    phi = mt.radians(lat)
    s = e * mt.sin(phi)
    U = 2.0 * (
        mt.atan(
            c["t0"] * mt.pow(mt.tan(phi / 2 + math.pi / 4), B_)
            / mt.pow((1.0 + s) / (1.0 - s), e * B_ / 2.0)
        )
        - math.pi / 4
    )
    V = B_ * mt.radians(_wrap_lon(mt, math.degrees(c["lam0"]) - lon))
    sU, cU = mt.sin(U), mt.cos(U)
    sT = ca * sU + sa * cU * mt.cos(V)
    T = mt.asin(sT)
    D = mt.asin(cU * mt.sin(V) / mt.cos(T))
    r = c["rt"] / mt.pow(mt.tan(T / 2 + math.pi / 4), n)
    th = n * D
    xs = r * mt.cos(th)   # southing
    yw = r * mt.sin(th)   # westing
    return p["fe"] - yw, p["fn"] - xs


def krovak_to_lonlat(mt: Any, x, y, p: dict):
    """Inverse.  The U-latitude relation tan(U/2+π/4) =
    t0·tan^B(φ/2+π/4)·q^(−eB/2) unwraps to EXACTLY the conformal
    latitude: χ = 2·atan((tan(U/2+π/4)/t0)^(1/B)) − π/2 satisfies
    Snyder 3-1, so φ comes from the closed-form series (3-5) — the same
    move the LCC/HOM inverses make.  (EPSG's fixed-point alternative is
    equivalent but, on the Column backend, each iteration would double
    the expression tree and stall Catalyst analysis.)"""
    c = _krovak_consts(p)
    B_, n = c["B"], c["n"]
    ca, sa = math.cos(c["alphac"]), math.sin(c["alphac"])
    yw = p["fe"] - x
    xs = p["fn"] - y
    r = mt.sqrt(xs * xs + yw * yw)
    th = mt.atan2(yw, xs)
    D = th / n
    T = 2.0 * (mt.atan(mt.pow(c["rt"] / r, 1.0 / n)) - math.pi / 4)
    sT, cT = mt.sin(T), mt.cos(T)
    U = mt.asin(ca * sT - sa * cT * mt.cos(D))
    V = mt.asin(cT * mt.sin(D) / mt.cos(U))
    lam = c["lam0"] - V / B_
    tU = mt.pow(mt.tan(U / 2 + math.pi / 4) / c["t0"], 1.0 / B_)
    chi = 2.0 * mt.atan(tU) - math.pi / 2
    phi = _conformal_to_geodetic(mt, chi, p["e2"])
    return _wrap_lon(mt, mt.degrees(lam)), mt.degrees(phi)


# ---- datum shifts: TOWGS84 7-parameter Helmert via ECEF --------------------
#
# The reference gets datum transformations from GDAL/osr; this engine
# implements the WKT1 TOWGS84 path (position-vector convention, EPSG
# 9606): geodetic(datum) → ECEF → Helmert → ECEF → geodetic(WGS84).
# Surface points are shifted at h=0 (raster registers carry no height;
# the h-sensitivity of the shift is ~1e-9·h, irrelevant at tile scale).


def _geodetic_to_ecef(mt: Any, lon, lat, a: float, e2: float):
    phi = mt.radians(lat)
    lam = mt.radians(lon)
    sp, cp = mt.sin(phi), mt.cos(phi)
    n = a / mt.sqrt(1 - e2 * sp * sp)
    x = n * cp * mt.cos(lam)
    y = n * cp * mt.sin(lam)
    z = n * (1 - e2) * sp
    return x, y, z


def _ecef_to_geodetic(mt: Any, x, y, z, a: float, e2: float):
    """Bowring's single-step formula — sub-mm for Earth ellipsoids."""
    b = a * math.sqrt(1 - e2)
    ep2 = e2 / (1 - e2)
    p = mt.sqrt(x * x + y * y)
    theta = mt.atan2(z * a, p * b)
    st, ct = mt.sin(theta), mt.cos(theta)
    phi = mt.atan2(z + ep2 * b * st * st * st, p - e2 * a * ct * ct * ct)
    lon = mt.degrees(mt.atan2(y, x))
    lat = mt.degrees(phi)
    return lon, lat


def _helmert(mt: Any, x, y, z, p7, inverse: bool = False):
    """Position-vector 7-parameter transformation (EPSG 9606):
    X' = T + (1+ds)·R·X with small-angle R.  ``inverse`` applies the
    standard sign-flipped reverse (second-order error ≪ 1 mm for real
    datum parameters)."""
    dx, dy, dz, rx_s, ry_s, rz_s, ds_ppm = p7
    sgn = -1.0 if inverse else 1.0
    dx, dy, dz = sgn * dx, sgn * dy, sgn * dz
    rx = sgn * math.radians(rx_s / 3600.0)
    ry = sgn * math.radians(ry_s / 3600.0)
    rz = sgn * math.radians(rz_s / 3600.0)
    s = 1.0 + sgn * ds_ppm * 1e-6
    x2 = dx + s * (x - rz * y + ry * z)
    y2 = dy + s * (rz * x + y - rx * z)
    z2 = dz + s * (-ry * x + rx * y + z)
    return x2, y2, z2


def _parse_ntv2_extension(wkt: str) -> str | None:
    """GDAL's WKT1 grid-shift convention: EXTENSION["PROJ4_GRIDS",
    "<file>"] inside the GEOGCS/PROJCS.  Returns the .gsb path, None
    when absent or "@null" (GDAL's explicit no-grid marker), and raises
    on non-NTv2 grid formats this engine does not read."""
    import re

    m = re.search(r'EXTENSION\["PROJ4_GRIDS",\s*"([^"]+)"\]', wkt)
    if m is None:
        return None
    # PROJ grid lists are comma-separated, try-in-order, with @optional
    # prefixes — take the FIRST readable (.gsb) entry, like PROJ skips
    # grid formats it cannot load
    entries = [e.strip().lstrip("@") for e in m.group(1).split(",")]
    entries = [e for e in entries if e and e not in ("null",)]
    if not entries:
        return None
    for e in entries:
        if e.lower().endswith(".gsb"):
            return e
    raise ValueError(
        f"unsupported datum grid list {m.group(1)!r}: no NTv2 .gsb "
        "entry (NTv1/GTX/CTable2 are not implemented)"
    )


def _attach_ntv2(p: dict, gpath: str, origin: str) -> dict:
    """Attach an NTv2 grid path to a parsed sref, enforcing the single-
    datum-path rule: a sref may carry ONE of {non-zero TOWGS84, NTv2
    grid}, from ONE source (WKT extension or |NTV2: suffix)."""
    tw = p.get("towgs84")
    if tw is not None and any(v != 0.0 for v in tw):
        raise ValueError(
            f"{origin} declares BOTH a non-zero TOWGS84 and an NTv2 "
            "grid — ambiguous datum path; drop one of them"
        )
    if p.get("ntv2") not in (None, gpath):
        raise ValueError(
            f"{origin} declares a second NTv2 grid {gpath!r} but the "
            f"sref already carries {p['ntv2']!r} — ambiguous datum path"
        )
    return {**p, "ntv2": gpath}


def _attach_wkt_ntv2(p: dict, wkt: str) -> dict:
    g = _parse_ntv2_extension(wkt)
    return _attach_ntv2(p, g, "WKT") if g else p


def _datum_to_wgs84(mt: Any, sref: dict, lon, lat):
    """Datum-local lon/lat → WGS84 lon/lat when the sref carries a
    datum path: an NTv2 grid (takes precedence — parse_sref rejects
    srefs declaring both) or a non-zero TOWGS84; identity otherwise
    (WGS84≈GRS80 policy)."""
    gpath = sref.get("ntv2")
    if gpath:
        from .ntv2 import apply_ntv2

        return apply_ntv2(mt, gpath, lon, lat)
    p7 = sref.get("towgs84")
    if not p7 or all(v == 0.0 for v in p7):
        return lon, lat
    a, e2 = sref.get("a", WGS84_A), sref.get("e2", WGS84_E2)
    x, y, z = _geodetic_to_ecef(mt, lon, lat, a, e2)
    x, y, z = _helmert(mt, x, y, z, p7)
    return _ecef_to_geodetic(mt, x, y, z, WGS84_A, WGS84_E2)


def _wgs84_to_datum(mt: Any, sref: dict, lon, lat):
    gpath = sref.get("ntv2")
    if gpath:
        from .ntv2 import apply_ntv2

        return apply_ntv2(mt, gpath, lon, lat, inverse=True)
    p7 = sref.get("towgs84")
    if not p7 or all(v == 0.0 for v in p7):
        return lon, lat
    a, e2 = sref.get("a", WGS84_A), sref.get("e2", WGS84_E2)
    x, y, z = _geodetic_to_ecef(mt, lon, lat, WGS84_A, WGS84_E2)
    x, y, z = _helmert(mt, x, y, z, p7, inverse=True)
    return _ecef_to_geodetic(mt, x, y, z, a, e2)


# ---- sref parsing + lon/lat hub --------------------------------------------


def _parse_shorthand(sref: str, kind: str, req: int, keys: list[str]) -> dict | None:
    """'KIND:v1,v2[,...]' → param dict; None on malformed input (same
    contract as the EPSG branch).  ``req`` values are required, the rest
    default to 0."""
    try:
        vals = [float(v) for v in sref.split(":", 1)[1].split(",")]
    except ValueError:
        return None
    if len(vals) < req or len(vals) > len(keys):
        return None
    vals += [0.0] * (len(keys) - len(vals))
    return {"kind": kind, **dict(zip(keys, vals))}


def parse_sref(sref: str) -> dict | None:
    """Spatial-reference string → parameter dict; None when unknown.

    Accepted forms:

    - EPSG codes: 4326, 3857, 326xx/327xx (UTM), 3035 (LAEA Europe),
      2154 (Lambert-93), 3413/3031 (polar stereographic), 5070 (CONUS
      Albers), 3395 (World Mercator), 4087/32662 (equidistant
      cylindrical), 3375 (Peninsular RSO, Hotine oblique Mercator A);
    - WKT1 PROJCS (AEQD, Transverse_Mercator, LCC 1SP/2SP, LAEA,
      Polar_Stereographic, Albers, Sinusoidal, Mercator_1SP/2SP,
      Equirectangular, Hotine_Oblique_Mercator A/B incl. ESRI/RSO
      spellings) and bare GEOGCS — TOWGS84 and
      EXTENSION["PROJ4_GRIDS","…gsb"] datum paths honored;
    - shorthands (WGS84 ellipsoid): AEQD:lat0,lon0[,fe,fn],
      TMERC:lat0,lon0[,k0,fe,fn], LCC:lat0,lon0,sp1,sp2[,fe,fn],
      LAEA:lat0,lon0[,fe,fn], STERE:/AEA:/SINU:/MERC:/EQC:, and
      HOM:lat0,lonc,alpha[,gamma,k0,fe,fn] (variant B);
    - any of the above + '|NTV2:<grid.gsb>' to attach a grid-shift
      datum path (one datum path per sref; conflicts raise)."""
    if not sref:
        return None
    if "|NTV2:" in sref:
        # '<base sref>|NTV2:<grid.gsb>' attaches a grid-shift datum path
        # (source datum → WGS84) to any supported base sref
        base, _, gpath = sref.partition("|NTV2:")
        if not gpath:
            raise ValueError("empty NTv2 grid path in sref suffix")
        p = parse_sref(base)
        if p is None:
            return None
        return _attach_ntv2(p, gpath, "sref suffix")
    if sref.lstrip().upper().startswith("PROJCS"):
        p = parse_wkt_projcs(sref)
        if p is not None:
            p = _attach_wkt_ntv2(p, sref)
        return p
    if sref.lstrip().upper().startswith("GEOGCS"):
        # bare geographic CRS: lon/lat on the declared datum — a
        # TOWGS84 clause makes cross-datum transforms real (round 5c)
        import re

        _check_geogcs_conventions(sref)

        sph = re.search(
            r'SPHEROID\["[^"]*",\s*([-+0-9.eE]+),\s*([-+0-9.eE]+)', sref
        )
        a, rf = (
            (float(sph.group(1)), float(sph.group(2)))
            if sph else ELLIPSOIDS["WGS84"]
        )
        out = {"kind": "lonlat", "a": a, "e2": _e2_of(a, rf)}
        tw = _parse_towgs84(sref)
        if tw is not None:
            out["towgs84"] = tw
        return _attach_wkt_ntv2(out, sref)
    u = sref.upper()
    wgs = {"a": WGS84_A, "e2": WGS84_E2}
    if u.startswith("AEQD:"):
        return _parse_shorthand(sref, "aeqd", 2, ["lat0", "lon0", "fe", "fn"])
    if u.startswith("TMERC:"):
        p = _parse_shorthand(sref, "tmerc", 2, ["lat0", "lon0", "k0", "fe", "fn"])
        if p is None:
            return None
        n_given = len(sref.split(":", 1)[1].split(","))
        if n_given >= 3 and p["k0"] == 0.0:
            # an EXPLICIT zero scale is degenerate — fail loudly like
            # the LCC/Albers cone cases (ADVICE r5 #4)
            raise ValueError("TMERC shorthand: explicit k0=0 is degenerate")
        if n_given < 3:
            p["k0"] = 1.0  # unscaled TM when omitted
        return {**p, **wgs}
    if u.startswith("LCC:"):
        p = _parse_shorthand(sref, "lcc", 4, ["lat0", "lon0", "sp1", "sp2", "fe", "fn"])
        return None if p is None else {**p, "k0": 1.0, **wgs}
    if u.startswith("LAEA:"):
        p = _parse_shorthand(sref, "laea", 2, ["lat0", "lon0", "fe", "fn"])
        return None if p is None else {**p, **wgs}
    if u.startswith("STERE:"):
        # STERE:lat_ts,lon0[,fe,fn] — lat_ts signed (south aspect < 0)
        p = _parse_shorthand(sref, "stere", 2, ["lat_ts", "lon0", "fe", "fn"])
        return None if p is None else {**p, "k0": 1.0, **wgs}
    if u.startswith("AEA:"):
        p = _parse_shorthand(sref, "aea", 4,
                             ["lat0", "lon0", "sp1", "sp2", "fe", "fn"])
        return None if p is None else {**p, **wgs}
    if u.startswith("SINU:"):
        # SINU:lon0[,fe,fn] on the MODIS authalic sphere (e2 = 0)
        p = _parse_shorthand(sref, "sinu", 1, ["lon0", "fe", "fn"])
        return None if p is None else {**p, "a": 6371007.181, "e2": 0.0}
    if u.startswith("MERC:"):
        # MERC:lat_ts,lon0[,fe,fn] — lat_ts=0 is the 1SP k0=1 form
        p = _parse_shorthand(sref, "merc", 2, ["lat_ts", "lon0", "fe", "fn"])
        if p is not None and abs(abs(p["lat_ts"]) - 90.0) < 1e-9:
            raise ValueError("MERC shorthand: lat_ts at a pole is degenerate")
        return None if p is None else {**p, "k0": 1.0, **wgs}
    if u.startswith("EQC:"):
        p = _parse_shorthand(sref, "eqc", 2, ["lat_ts", "lon0", "fe", "fn"])
        if p is not None and abs(abs(p["lat_ts"]) - 90.0) < 1e-9:
            raise ValueError("EQC shorthand: lat_ts at a pole is degenerate")
        return None if p is None else {**p, **wgs}
    if u.startswith("HOM:"):
        # HOM:lat0,lonc,alpha[,gamma,k0,fe,fn] — variant B (azimuth at
        # the projection center, the common RSO/Swiss aspect) on WGS84
        p = _parse_shorthand(
            sref, "hom", 3, ["lat0", "lonc", "alpha", "gamma", "k0", "fe", "fn"]
        )
        if p is None:
            return None
        n_given = len(sref.split(":", 1)[1].split(","))
        if n_given < 4:
            p["gamma"] = p["alpha"]  # rectified grid angle = azimuth
        if n_given >= 5 and p["k0"] == 0.0:
            raise ValueError("HOM shorthand: explicit k0=0 is a "
                             "degenerate scale")
        if n_given < 5:
            p["k0"] = 1.0
        return {**p, "variant": "B", **wgs}
    if u.startswith("KROVAK:"):
        # KROVAK:lat0,lon0,alpha,lat_p,k0[,fe,fn] — east-north axes on
        # Bessel 1841 (the projection only makes sense on its national
        # ellipsoid; no datum shift attached — add |NTV2: or use
        # EPSG:5514 for the Helmert leg)
        p = _parse_shorthand(
            sref, "krovak", 5,
            ["lat0", "lon0", "alpha", "lat_p", "k0", "fe", "fn"],
        )
        if p is None:
            return None
        if p["k0"] == 0.0:
            raise ValueError("KROVAK shorthand: explicit k0=0 is a "
                             "degenerate scale")
        ab, rfb = ELLIPSOIDS["Bessel"]
        return {**p, "a": ab, "e2": _e2_of(ab, rfb)}
    if not u.startswith("EPSG:"):
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
    a80, rf80 = ELLIPSOIDS["GRS80"]
    grs = {"a": a80, "e2": _e2_of(a80, rf80)}
    if code == 3035:
        # ETRS89-extended / LAEA Europe (no datum shift: ETRS89≈WGS84)
        return {"kind": "laea", **grs, "lat0": 52.0, "lon0": 10.0,
                "fe": 4321000.0, "fn": 3210000.0}
    if code == 2154:
        # RGF93 / Lambert-93 (France; RGF93≈WGS84)
        return {"kind": "lcc", **grs, "lat0": 46.5, "lon0": 3.0,
                "sp1": 49.0, "sp2": 44.0, "k0": 1.0,
                "fe": 700000.0, "fn": 6600000.0}
    if code == 3413:
        # WGS84 / NSIDC Sea Ice Polar Stereographic North
        return {"kind": "stere", "a": WGS84_A, "e2": WGS84_E2,
                "lat_ts": 70.0, "lon0": -45.0, "k0": 1.0,
                "fe": 0.0, "fn": 0.0}
    if code == 3031:
        # WGS84 / Antarctic Polar Stereographic
        return {"kind": "stere", "a": WGS84_A, "e2": WGS84_E2,
                "lat_ts": -71.0, "lon0": 0.0, "k0": 1.0,
                "fe": 0.0, "fn": 0.0}
    if code == 5070:
        # NAD83 / CONUS Albers (NAD83≈WGS84 at the meter level — no
        # datum shift applied, same policy as ETRS89/RGF93)
        return {"kind": "aea", **grs, "lat0": 23.0, "lon0": -96.0,
                "sp1": 29.5, "sp2": 45.5, "fe": 0.0, "fn": 0.0}
    if code == 3395:
        # WGS 84 / World Mercator (variant A, k0 = 1)
        return {"kind": "merc", "a": WGS84_A, "e2": WGS84_E2,
                "lat_ts": 0.0, "lon0": 0.0, "k0": 1.0,
                "fe": 0.0, "fn": 0.0}
    if code in (4087, 32662):
        # WGS 84 / World Equidistant Cylindrical (EPSG method 1028);
        # 32662 is the deprecated Plate Carrée alias of the same grid
        return {"kind": "eqc", "a": WGS84_A, "e2": WGS84_E2,
                "lat_ts": 0.0, "lon0": 0.0, "fe": 0.0, "fn": 0.0}
    if code == 3375:
        # GDM2000 / Peninsular RSO (Malaysia) — Hotine oblique Mercator
        # VARIANT A (EPSG method 9812); GDM2000 is ITRF2000-based ≈ WGS84
        return {"kind": "hom", **grs, "variant": "A",
                "lat0": 4.0, "lonc": 102.25,
                "alpha": 323.0257964666666,   # 323°01'32.86728" exactly
                "gamma": 323.1301023611111,   # 323°07'48.3685"
                "k0": 0.99984, "fe": 804671.0, "fn": 0.0}
    if code == 5514:
        # S-JTSK / Krovak East North (Czechia + Slovakia).  Bessel 1841;
        # the 3-parameter S-JTSK→WGS84 shift is the EPSG 1622/GDAL WKT1
        # value (≈1 m class, the standard national approximation)
        ab, rfb = ELLIPSOIDS["Bessel"]
        return {"kind": "krovak", "a": ab, "e2": _e2_of(ab, rfb),
                "lat0": 49.5,
                "lon0": 24.833333333333332,   # 24°50' (Ferro folded in)
                "alpha": 30.28813975,         # 30°17'17.3031"
                "lat_p": 78.5, "k0": 0.9999, "fe": 0.0, "fn": 0.0,
                "towgs84": (589.0, 76.0, 480.0, 0.0, 0.0, 0.0, 0.0)}
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
    if sref["kind"] == "tmerc":
        return tmerc_to_lonlat(mt, x, y, sref)
    if sref["kind"] == "lcc":
        return lcc_to_lonlat(mt, x, y, sref)
    if sref["kind"] == "laea":
        return laea_to_lonlat(mt, x, y, sref)
    if sref["kind"] == "stere":
        return stere_to_lonlat(mt, x, y, sref)
    if sref["kind"] == "aea":
        return aea_to_lonlat(mt, x, y, sref)
    if sref["kind"] == "sinu":
        return sinu_to_lonlat(mt, x, y, sref)
    if sref["kind"] == "merc":
        return merc_to_lonlat(mt, x, y, sref)
    if sref["kind"] == "eqc":
        return eqc_to_lonlat(mt, x, y, sref)
    if sref["kind"] == "hom":
        return hom_to_lonlat(mt, x, y, sref)
    if sref["kind"] == "krovak":
        return krovak_to_lonlat(mt, x, y, sref)
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
    if sref["kind"] == "tmerc":
        return lonlat_to_tmerc(mt, lon, lat, sref)
    if sref["kind"] == "lcc":
        return lonlat_to_lcc(mt, lon, lat, sref)
    if sref["kind"] == "laea":
        return lonlat_to_laea(mt, lon, lat, sref)
    if sref["kind"] == "stere":
        return lonlat_to_stere(mt, lon, lat, sref)
    if sref["kind"] == "aea":
        return lonlat_to_aea(mt, lon, lat, sref)
    if sref["kind"] == "sinu":
        return lonlat_to_sinu(mt, lon, lat, sref)
    if sref["kind"] == "merc":
        return lonlat_to_merc(mt, lon, lat, sref)
    if sref["kind"] == "eqc":
        return lonlat_to_eqc(mt, lon, lat, sref)
    if sref["kind"] == "hom":
        return lonlat_to_hom(mt, lon, lat, sref)
    if sref["kind"] == "krovak":
        return lonlat_to_krovak(mt, lon, lat, sref)
    raise ValueError(f"unsupported sref {sref}")


def transform(mt: Any, src_sref: str, dst_sref: str, x, y):
    """World coords in ``src_sref`` → ``dst_sref`` via the lon/lat hub.
    Raises when either sref is outside the supported set."""
    s, d = parse_sref(src_sref), parse_sref(dst_sref)
    if s is None or d is None:
        raise ValueError(
            f"unsupported CRS pair {src_sref!r} → {dst_sref!r}: supported "
            "are EPSG:4326, EPSG:3857, EPSG:326xx/327xx (UTM), EPSG:3035, "
            "EPSG:2154, EPSG:3413/3031 (polar stereographic), EPSG:5070 "
            "(CONUS Albers), EPSG:3395 (World Mercator), EPSG:4087/32662 "
            "(equidistant cylindrical), and PROJCS WKT (or KIND:… "
            "shorthand) for AEQD, Transverse_Mercator, "
            "Lambert_Conformal_Conic, Lambert_Azimuthal_Equal_Area, "
            "Polar_Stereographic, Albers_Conic_Equal_Area, Sinusoidal, "
            "Mercator_1SP/2SP, Equirectangular, "
            "Hotine_Oblique_Mercator (variants A/B, incl. EPSG:3375) and "
            "Krovak east-north (EPSG:5514)"
        )
    lon, lat = to_lonlat(mt, s, x, y)
    # datum legs: only active when a sref declares a datum path (an
    # NTv2 grid or a non-zero TOWGS84) — the WGS84≈GRS80≈NAD83 family
    # short-circuits to identity
    lon, lat = _datum_to_wgs84(mt, s, lon, lat)
    lon, lat = _wgs84_to_datum(mt, d, lon, lat)
    return from_lonlat(mt, d, lon, lat)


def utm_zone_of(lon: float) -> int:
    """UTM zone containing longitude ``lon`` (degrees, [-180, 180))."""
    return int((lon + 180.0) // 6.0) % 60 + 1


def utm_epsg(lon: float, lat: float) -> str:
    """EPSG code string of the WGS84 UTM zone containing (lon, lat) —
    convenience for picking a dst sref from data extent."""
    zone = utm_zone_of(lon)
    return f"EPSG:{(32600 if lat >= 0 else 32700) + zone}"
