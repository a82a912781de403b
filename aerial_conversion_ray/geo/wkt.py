"""WKT geometry codec for rect footprints (M1 ``wkt_parser`` analog,
reference ``aerial_conversion/coordinates.py`` WKT handling).

Encode emits ``POLYGON ((minx miny, maxx miny, maxx maxy, minx maxy,
minx miny))`` with %.17g floats (shortest format guaranteed to
round-trip float64), decode parses the rect ring back with one
vectorized regex extract — no per-row Python loops (np.char /
pandas.str are C-level element kernels).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_RECT_RE = r"^POLYGON \(\((\S+) (\S+), (\S+) \S+, \S+ (\S+), "


def encode_rects_wkt(
    minx: np.ndarray, miny: np.ndarray, maxx: np.ndarray, maxy: np.ndarray
) -> pd.Series:
    """One WKT POLYGON string per rect (closed CCW ring from the
    bottom-left corner)."""
    a = np.char.mod("%.17g", np.asarray(minx, dtype=np.float64))
    b = np.char.mod("%.17g", np.asarray(miny, dtype=np.float64))
    c = np.char.mod("%.17g", np.asarray(maxx, dtype=np.float64))
    d = np.char.mod("%.17g", np.asarray(maxy, dtype=np.float64))
    sp, cm = np.array(" "), np.array(", ")
    ring = np.char.add
    body = ring(
        ring(ring(ring(a, sp), b), cm),
        ring(
            ring(ring(ring(c, sp), b), cm),
            ring(
                ring(ring(ring(c, sp), d), cm),
                ring(ring(ring(ring(a, sp), d), cm), ring(ring(a, sp), b)),
            ),
        ),
    )
    return pd.Series(np.char.add(np.char.add("POLYGON ((", body), "))"))


def parse_rects_wkt(wkt: pd.Series) -> pd.DataFrame:
    """Inverse of :func:`encode_rects_wkt`: (minx, miny, maxx, maxy)
    float64 columns, exact bit round-trip."""
    ext = wkt.astype(str).str.extract(_RECT_RE)
    out = ext.astype(np.float64)
    out.columns = ["minx", "miny", "maxx", "maxy"]
    return out
