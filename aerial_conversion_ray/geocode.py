"""Deterministic geocode: pages/documents -> point + polygon footprint.

The north-star corpus is Common-Crawl-style pages ``(url, warc_ts,
html, text, lang)`` geocoded to synthetic footprints (BASELINE.json
``input_hint``).  The geocode is a PURE integer/float function of
``doc_id`` so that:

1. the engine (numpy inside ``map_batches``) and the DuckDB
   correctness oracle compute bit-identical doubles — every op is
   exact integer arithmetic followed by the same IEEE-754 double ops
   in the same order;
2. a Zipf-style hot spot exists by construction: HOT_FRACTION of all
   rows land in one ~0.25 deg cluster (one res-9 cell), exercising
   the skew/salting path (SURVEY.md §4).

numpy implementation: :func:`geocode_arrays`.
SQL mirror: :data:`SQL_EXPRS` (same constants, same op order).
"""

from __future__ import annotations

import numpy as np

# --- shared constants (single source of truth for engine AND oracle) ---
MULT = 2654435761          # Knuth multiplicative hash constant (public)
ADD = 987654321
MOD = 4294967296           # 2**32
HOT_MOD = 10
HOT_LT = 2                 # 20% of rows are "hot"
U_DIV1, U_DIV2, R_DIV = 7, 13, 17
U_MOD = 1000000
R_MOD = 1000
R_SCALE = 200000.0         # half-size 0.001 .. 0.006 deg
R_BASE = 0.001
HOT_LON0, HOT_LAT0, HOT_SPREAD = 151.0, -33.9, 0.25
COLD_LON0, COLD_LON_SPAN = -180.0, 360.0
COLD_LAT0, COLD_LAT_SPAN = -85.0, 170.0

WARC_EPOCH = np.datetime64("2024-01-01T00:00:00", "us")


def geocode_arrays(doc_id: np.ndarray) -> dict[str, np.ndarray]:
    """Vectorized geocode.  Returns lon, lat, half-size r (deg), and
    footprint rect corners; all float64, plus the hot flag."""
    did = np.asarray(doc_id, dtype=np.int64)
    h = (did * MULT + ADD) % MOD
    hot = (h % HOT_MOD) < HOT_LT
    u1 = ((h // U_DIV1) % U_MOD) / float(U_MOD)
    u2 = ((h // U_DIV2) % U_MOD) / float(U_MOD)
    r = R_BASE + ((h // R_DIV) % R_MOD) / R_SCALE
    lon = np.where(hot, HOT_LON0 + u1 * HOT_SPREAD, COLD_LON0 + u1 * COLD_LON_SPAN)
    lat = np.where(hot, HOT_LAT0 + u2 * HOT_SPREAD, COLD_LAT0 + u2 * COLD_LAT_SPAN)
    return {
        "lon": lon,
        "lat": lat,
        "r": r,
        "fp_minx": lon - r,
        "fp_miny": lat - r,
        "fp_maxx": lon + r,
        "fp_maxy": lat + r,
        "hot": hot,
    }


def make_urls(doc_id: np.ndarray, source: np.ndarray) -> np.ndarray:
    """url = 'https://{source}.example/doc/{doc_id}' (SQL: concat)."""
    return np.char.add(
        np.char.add(
            np.char.add("https://", np.asarray(source, dtype="U32")), ".example/doc/"
        ),
        np.asarray(doc_id).astype("U20"),
    )


def warc_ts_us(doc_id: np.ndarray) -> np.ndarray:
    """warc_ts = 2024-01-01 + doc_id seconds, timestamp[us]."""
    return WARC_EPOCH + np.asarray(doc_id, dtype="timedelta64[s]").astype(
        "timedelta64[us]"
    )


# --- SQL mirror (DuckDB) -------------------------------------------------
# Built from the same constants; every arithmetic op appears in the same
# order as geocode_arrays so doubles match bit-for-bit.

_H = f"(((doc_id * {MULT}) + {ADD}) % {MOD})"
_HOT = f"(({_H} % {HOT_MOD}) < {HOT_LT})"
_U1 = f"((({_H} // {U_DIV1}) % {U_MOD}) / {float(U_MOD)!r})"
_U2 = f"((({_H} // {U_DIV2}) % {U_MOD}) / {float(U_MOD)!r})"
_R = f"({R_BASE!r} + (({_H} // {R_DIV}) % {R_MOD}) / {R_SCALE!r})"
_LON = (
    f"(case when {_HOT} then {HOT_LON0!r} + {_U1} * {HOT_SPREAD!r} "
    f"else {COLD_LON0!r} + {_U1} * {COLD_LON_SPAN!r} end)"
)
_LAT = (
    f"(case when {_HOT} then {HOT_LAT0!r} + {_U2} * {HOT_SPREAD!r} "
    f"else {COLD_LAT0!r} + {_U2} * {COLD_LAT_SPAN!r} end)"
)

SQL_EXPRS: dict[str, str] = {
    "h": _H,
    "hot": _HOT,
    "u1": _U1,
    "u2": _U2,
    "r": _R,
    "lon": _LON,
    "lat": _LAT,
    "fp_minx": f"({_LON} - {_R})",
    "fp_miny": f"({_LAT} - {_R})",
    "fp_maxx": f"({_LON} + {_R})",
    "fp_maxy": f"({_LAT} + {_R})",
    "url": "('https://' || source || '.example/doc/' || cast(doc_id as varchar))",
    "warc_ts": "(TIMESTAMP '2024-01-01 00:00:00' + to_microseconds(doc_id * 1000000))",
}


def geocoded_documents_cte(extra_cols: str = "") -> str:
    """A DuckDB CTE body selecting documents with geocode columns —
    shared prefix for most oracle queries."""
    return (
        "select doc_id, text, lang, source, n_chars, "
        f"{SQL_EXPRS['lon']} as lon, {SQL_EXPRS['lat']} as lat, "
        f"{SQL_EXPRS['fp_minx']} as fp_minx, {SQL_EXPRS['fp_miny']} as fp_miny, "
        f"{SQL_EXPRS['fp_maxx']} as fp_maxx, {SQL_EXPRS['fp_maxy']} as fp_maxy"
        f"{extra_cols} from documents"
    )
