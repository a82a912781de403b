"""Pure-numpy geospatial kernels (no GEOS/shapely in this environment).

Everything here is deterministic, vectorized, and reproducible in
ANSI SQL where the correctness oracle needs it.
"""
