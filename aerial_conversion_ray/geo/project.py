"""Coordinate reprojection: EPSG:4326 <-> EPSG:3857 (web mercator).

The reference reprojects via fiona/pyproj (`reproject_coords`,
``aerial_conversion/coordinates.py:56-71``; the orthogonalise rotate
round-trips through 3857, ``orthogonalise/orthogonalise.py:152-178``).
No CRS library exists in this container; the spherical-mercator
formulas are closed-form, so the engine implements them directly in
numpy with a DuckDB-mirrorable op order.

Fixed-point parity: numpy and DuckDB libm (tan/log) differ by ~1 ulp,
so checked outputs go through ``floor(x * 1e6 + 0.5)`` micrometer keys
(x <= 2e7 m -> x * 1e6 < 2^53, exact in double).
"""

from __future__ import annotations

import numpy as np

R_MERC = 6378137.0
LAT_MAX = 85.051128779806604  # atan(sinh(pi)) in degrees: mercator validity


def to_mercator(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 degrees -> EPSG:3857 meters (spherical mercator)."""
    lat = np.clip(np.asarray(lat, dtype=np.float64), -LAT_MAX, LAT_MAX)
    x = R_MERC * np.radians(np.asarray(lon, dtype=np.float64))
    y = R_MERC * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def from_mercator(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:3857 meters -> EPSG:4326 degrees."""
    lon = np.degrees(np.asarray(x, dtype=np.float64) / R_MERC)
    lat = np.degrees(
        2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / R_MERC)) - np.pi / 2.0
    )
    return lon, lat


def mercator_sql(lon_sql: str, lat_sql: str) -> dict[str, str]:
    """DuckDB expressions mirroring :func:`to_mercator` op-for-op
    (before fixed-point snapping)."""
    lat_c = f"least(greatest({lat_sql}, {-LAT_MAX!r}), {LAT_MAX!r})"
    return {
        "merc_x": f"({R_MERC!r} * radians({lon_sql}))",
        "merc_y": f"({R_MERC!r} * ln(tan(pi() / 4.0 + radians({lat_c}) / 2.0)))",
    }


# --------------------------------------------------------------------------
# UTM (ellipsoidal transverse Mercator, Krüger n-series to n^4)
# --------------------------------------------------------------------------
#
# The reference's metric area filter reprojects to
# ``estimate_utm_crs()`` via pyproj (``coordinates.py:194-198``).  No
# CRS library exists in this container; the Krüger flattening series
# (Karney 2011, "Transverse Mercator with an accuracy of a few
# nanometers"; coefficients as published on the public reference
# tables) is closed-form and DuckDB-mirrorable.  Truncated at n^4 the
# series is sub-millimeter over a UTM zone — far below the 1e-3
# fixed-point snap used for oracle parity.
#
# DuckDB has no sinh/cosh/atanh, so BOTH sides (numpy here, SQL in
# :func:`utm_sql_ctes`) spell them out via exp/ln with identical
# operation order — 1-ulp libm noise is absorbed by the mm snap.

A_WGS84 = 6378137.0
F_WGS84 = 1.0 / 298.257223563
N_KR = F_WGS84 / (2.0 - F_WGS84)                       # third flattening
K0_UTM = 0.9996
E0_UTM = 500000.0
FN_SOUTH = 10000000.0
A_KR = A_WGS84 / (1.0 + N_KR) * (1.0 + N_KR**2 / 4.0 + N_KR**4 / 64.0)
ALPHA_KR = (
    N_KR / 2.0 - 2.0 * N_KR**2 / 3.0 + 5.0 * N_KR**3 / 16.0
    + 41.0 * N_KR**4 / 180.0,
    13.0 * N_KR**2 / 48.0 - 3.0 * N_KR**3 / 5.0 + 557.0 * N_KR**4 / 1440.0,
    61.0 * N_KR**3 / 240.0 - 103.0 * N_KR**4 / 140.0,
    49561.0 * N_KR**4 / 161280.0,
)
C_KR = 2.0 * np.sqrt(N_KR) / (1.0 + N_KR)


def _atanh(x: np.ndarray) -> np.ndarray:
    return 0.5 * np.log((1.0 + x) / (1.0 - x))


def _sinh(x: np.ndarray) -> np.ndarray:
    return (np.exp(x) - np.exp(-x)) * 0.5


def _cosh(x: np.ndarray) -> np.ndarray:
    return (np.exp(x) + np.exp(-x)) * 0.5


def utm_zone(lon: np.ndarray) -> np.ndarray:
    """Standard 6-degree UTM zone number, clipped to [1, 60]."""
    z = np.floor((np.asarray(lon, np.float64) + 180.0) / 6.0).astype(np.int64) + 1
    return np.clip(z, 1, 60)


def to_utm(
    lon: np.ndarray, lat: np.ndarray, zone: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """EPSG:4326 degrees -> (zone, easting m, northing m), WGS84
    ellipsoid, Krüger series to n^4.  ``zone`` overrides the per-point
    zone (the reference projects a whole layer into ONE estimated
    zone; footprint corners must share their centroid's zone so the
    polygon stays consistent)."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    if zone is None:
        zone = utm_zone(lon)
    zone = np.asarray(zone, np.int64)
    lam = np.radians(lon - (zone * 6.0 - 183.0))
    phi = np.radians(lat)
    s = np.sin(phi)
    t = _sinh(_atanh(s) - C_KR * _atanh(C_KR * s))
    xip = np.arctan2(t, np.cos(lam))
    etap = _atanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    xi = xip.copy()
    eta = etap.copy()
    for j, a in enumerate(ALPHA_KR, start=1):
        xi = xi + a * np.sin(2.0 * j * xip) * _cosh(2.0 * j * etap)
        eta = eta + a * np.cos(2.0 * j * xip) * _sinh(2.0 * j * etap)
    east = E0_UTM + K0_UTM * A_KR * eta
    north = K0_UTM * A_KR * xi + np.where(lat < 0.0, FN_SOUTH, 0.0)
    return zone, east, north


def utm_sql_ctes(
    src: str, lon_col: str = "lon", lat_col: str = "lat",
    zone_expr: str | None = None, keep: str = "page_id",
) -> str:
    """CTE chain projecting ``src(lon, lat, ...)`` to UTM with the
    exact operation order of :func:`to_utm`.  Appends CTEs named
    ``u0..u4``; the final ``u4`` exposes (``keep`` columns, zone,
    east, north).  ``zone_expr`` (over ``src`` columns) overrides the
    per-point zone."""
    zexpr = zone_expr or (
        f"least(greatest(cast(floor(({lon_col} + 180.0) / 6.0) as bigint)"
        " + 1, 1), 60)"
    )
    # DuckDB parses plain decimal literals as DECIMAL and overflows
    # multiplying them — force every constant to DOUBLE
    D = lambda x: f"cast({x!r} as double)"  # noqa: E731
    atanh = lambda x: f"(0.5 * ln((1.0 + {x}) / (1.0 - {x})))"  # noqa: E731
    sinh = lambda x: f"((exp({x}) - exp(-({x}))) * 0.5)"  # noqa: E731
    cosh = lambda x: f"((exp({x}) + exp(-({x}))) * 0.5)"  # noqa: E731
    xi = "xip"
    eta = "etap"
    for j, a in enumerate(ALPHA_KR, start=1):
        xi += f" + {D(a)} * sin(2.0 * {j} * xip) * {cosh(f'2.0 * {j} * etap')}"
        eta += f" + {D(a)} * cos(2.0 * {j} * xip) * {sinh(f'2.0 * {j} * etap')}"
    return f"""
u0 as (select {keep}, {lon_col} as lon_, {lat_col} as lat_, {zexpr} as zone
       from {src}),
u1 as (select *, radians(lon_ - (zone * 6.0 - 183.0)) as lam,
               radians(lat_) as phi from u0),
u2 as (select *, sin(phi) as s from u1),
u3 as (select *, {sinh(f"{atanh('s')} - {D(C_KR)} * {atanh(f'{D(C_KR)} * s')}")} as t
       from u2),
u4 as (select *, atan2(t, cos(lam)) as xip,
               {atanh("sin(lam) / sqrt(1.0 + t * t)")} as etap from u3),
u5 as (select {keep}, zone, lat_,
              {D(E0_UTM)} + {D(K0_UTM)} * {D(A_KR)} * ({eta}) as east,
              {D(K0_UTM)} * {D(A_KR)} * ({xi})
                + case when lat_ < 0.0 then {D(FN_SOUTH)} else 0.0 end as north
       from u4)
"""


# --------------------------------------------------------------------------
# Lambert conformal conic (2SP, EPSG method 9802) + polar stereographic
# (variant A, EPSG method 9810) — closed-form ellipsoidal, WGS84
# --------------------------------------------------------------------------
#
# The reference accepts ANY raster CRS and reprojects via fiona/pyproj
# (``aerial_conversion/coordinates.py:41-53,56-71``,
# ``scripts/geojson2coco.py:183-188``).  No CRS library exists in this
# container, so the engine closes the gap with the closed-form conformal
# families a regional raster actually uses: web mercator (above), UTM
# (above), Lambert conformal conic (state-plane / national grids), and
# polar stereographic (polar products).  Formulas are the published
# Snyder / EPSG guidance-note forms; the derived constants (n, F, rho0)
# are computed ONCE in Python and embedded as literals in the SQL
# mirror, so both engines share identical doubles and only the
# per-point sin/cos/tan/pow libm ulps remain — absorbed by the mm snap.

E_WGS84 = float(np.sqrt(F_WGS84 * (2.0 - F_WGS84)))   # first eccentricity

# demo LCC: CONUS-style secant cone on WGS84 (std parallels 33/45)
LCC_LAT1, LCC_LAT2 = 33.0, 45.0
LCC_LAT0, LCC_LON0 = 23.0, -96.0
LCC_E0, LCC_N0 = 0.0, 0.0


def _conf_t(phi: np.ndarray) -> np.ndarray:
    """Snyder's isometric-colatitude function t(phi) =
    tan(pi/4 - phi/2) / ((1 - e sin phi)/(1 + e sin phi))^(e/2)."""
    s = np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / np.power(
        (1.0 - E_WGS84 * s) / (1.0 + E_WGS84 * s), E_WGS84 / 2.0
    )


def _conf_m(phi: np.ndarray) -> np.ndarray:
    """m(phi) = cos(phi) / sqrt(1 - e^2 sin^2 phi)."""
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - (E_WGS84 * E_WGS84) * s * s)


def _lcc_constants() -> tuple[float, float, float]:
    """(n, F, rho0) for the module's 2SP Lambert cone — evaluated once
    in Python and shared verbatim with the SQL mirror."""
    p1 = np.radians(LCC_LAT1)
    p2 = np.radians(LCC_LAT2)
    p0 = np.radians(LCC_LAT0)
    m1, m2 = float(_conf_m(p1)), float(_conf_m(p2))
    t1, t2 = float(_conf_t(p1)), float(_conf_t(p2))
    t0 = float(_conf_t(p0))
    n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    f = m1 / (n * np.power(t1, n))
    rho0 = A_WGS84 * f * np.power(t0, n)
    return float(n), float(f), float(rho0)


LCC_N, LCC_F, LCC_RHO0 = _lcc_constants()


def to_lcc(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 degrees -> Lambert conformal conic meters (module
    constants cone).  Valid away from the poles (|lat| <= ~89)."""
    lam = np.radians(np.asarray(lon, np.float64) - LCC_LON0)
    phi = np.radians(np.asarray(lat, np.float64))
    rho = A_WGS84 * LCC_F * np.power(_conf_t(phi), LCC_N)
    th = LCC_N * lam
    x = LCC_E0 + rho * np.sin(th)
    y = LCC_N0 + LCC_RHO0 - rho * np.cos(th)
    return x, y


def lcc_sql_exprs(lon_sql: str, lat_sql: str) -> dict[str, str]:
    """DuckDB expressions mirroring :func:`to_lcc` op-for-op, with the
    Python-evaluated cone constants embedded as double literals."""
    D = lambda x: f"cast({x!r} as double)"  # noqa: E731
    phi = f"radians({lat_sql})"
    s = f"sin({phi})"
    t = (
        f"(tan(pi() / 4.0 - {phi} / 2.0) / "
        f"pow((1.0 - {D(E_WGS84)} * {s}) / (1.0 + {D(E_WGS84)} * {s}), "
        f"{D(E_WGS84 / 2.0)}))"
    )
    rho = f"({D(A_WGS84)} * {D(LCC_F)} * pow({t}, {D(LCC_N)}))"
    th = f"({D(LCC_N)} * radians({lon_sql} - {D(LCC_LON0)}))"
    return {
        "lcc_x": f"({D(LCC_E0)} + {rho} * sin({th}))",
        "lcc_y": f"({D(LCC_N0)} + {D(LCC_RHO0)} - {rho} * cos({th}))",
    }


# polar stereographic, north aspect, scale k0 at the pole (EPSG 9810)
PST_K0 = 0.994
PST_LON0 = 0.0
PST_E0, PST_N0 = 2000000.0, 2000000.0
PST_RHO_DEN = float(
    np.sqrt(
        np.power(1.0 + E_WGS84, 1.0 + E_WGS84)
        * np.power(1.0 - E_WGS84, 1.0 - E_WGS84)
    )
)


def to_polar_stereo(
    lon: np.ndarray, lat: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 degrees -> north polar stereographic meters (variant
    A: scale factor at the pole).  Defined for lat > -90."""
    lam = np.radians(np.asarray(lon, np.float64) - PST_LON0)
    phi = np.radians(np.asarray(lat, np.float64))
    rho = 2.0 * A_WGS84 * PST_K0 * _conf_t(phi) / PST_RHO_DEN
    x = PST_E0 + rho * np.sin(lam)
    y = PST_N0 - rho * np.cos(lam)
    return x, y


def polar_stereo_sql_exprs(lon_sql: str, lat_sql: str) -> dict[str, str]:
    """DuckDB mirror of :func:`to_polar_stereo`."""
    D = lambda x: f"cast({x!r} as double)"  # noqa: E731
    phi = f"radians({lat_sql})"
    s = f"sin({phi})"
    t = (
        f"(tan(pi() / 4.0 - {phi} / 2.0) / "
        f"pow((1.0 - {D(E_WGS84)} * {s}) / (1.0 + {D(E_WGS84)} * {s}), "
        f"{D(E_WGS84 / 2.0)}))"
    )
    rho = f"(2.0 * {D(A_WGS84)} * {D(PST_K0)} * {t} / {D(PST_RHO_DEN)})"
    lam = f"radians({lon_sql} - {D(PST_LON0)})"
    return {
        "pst_x": f"({D(PST_E0)} + {rho} * sin({lam}))",
        "pst_y": f"({D(PST_N0)} - {rho} * cos({lam}))",
    }


def project_to_crs(
    crs: str, lon: np.ndarray, lat: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Dispatch lon/lat degrees into the coordinate system a
    ``RasterSpec.crs`` names — the engine's counterpart of the
    reference's accept-any-CRS raster path (``coordinates.py:41-53``).
    Supported: ``EPSG:4326`` (identity, degrees), ``EPSG:3857``,
    ``UTM:<zone>[S]``, ``LCC`` (module cone), ``PSTEREO`` (north
    polar).  Unknown names raise loudly rather than guessing."""
    c = crs.upper()
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    if c in ("EPSG:4326", "CRS:84", "WGS84"):
        return lon, lat
    if c == "EPSG:3857":
        return to_mercator(lon, lat)
    if c.startswith("UTM:"):
        z = c[4:]
        south = z.endswith("S")
        zone = int(z.rstrip("SN"))
        _, e_, n_ = to_utm(lon, lat, np.full(len(lon), zone, dtype=np.int64))
        if south:
            n_ = np.where(lat >= 0.0, n_ + FN_SOUTH, n_)
        return e_, n_
    if c == "LCC":
        return to_lcc(lon, lat)
    if c == "PSTEREO":
        return to_polar_stereo(lon, lat)
    raise ValueError(f"unsupported raster CRS: {crs!r}")
