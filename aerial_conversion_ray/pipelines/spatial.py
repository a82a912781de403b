"""Spatial pipelines: geocode, cell index, tile joins, kNN.

Ray-Data-first re-expression of the reference's forward path
(``scripts/geojson2coco.py`` — vector+raster -> tiles -> COCO) over
the pages corpus: every stage is ``map_batches`` over zero-copy Arrow
with numpy kernels; the tile "join" is key arithmetic against the
deterministic grid (the reference's per-tile ``gpd.clip`` loop,
``aerial_conversion/coordinates.py:170-203``, becomes a vectorized
candidate-expand + rect-clip with NO shuffle); kNN is k-ring candidate
expansion + haversine refine (``aerial_conversion/tiles.py:180-256``
neighbourhood semantics generalized).

Oracle SQL mirrors live in ``pipelines/sql_oracle.py`` — built from
the same constants.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..config import EngineConfig
from ..geo import cells
from ..geo.haversine import haversine_m
from ..geocode import geocode_arrays
from ..sources.pages import pages_dataset

DEFAULT_CFG = EngineConfig()


# --------------------------------------------------------------------------
# stages (stateless vectorized batch fns)
# --------------------------------------------------------------------------

def geocode_batch(t: pa.Table, id_col: str = "page_id") -> pa.Table:
    """Append lon/lat + footprint rect columns (pure fn of id)."""
    g = geocode_arrays(t[id_col].to_numpy(zero_copy_only=False))
    for name in ("lon", "lat", "fp_minx", "fp_miny", "fp_maxx", "fp_maxy"):
        t = t.append_column(name, pa.array(g[name]))
    return t


def cell_encode_batch(t: pa.Table, resolutions=(7, 9, 11)) -> pa.Table:
    lon = t["lon"].to_numpy()
    lat = t["lat"].to_numpy()
    for res in resolutions:
        t = t.append_column(f"cell_r{res}", pa.array(cells.encode(lon, lat, res)))
    return t


def hilbert_batch(t: pa.Table, res: int = 9) -> pa.Table:
    """Space-filling partition key from the res-cell (locality layout)."""
    key = cells.hilbert_of_cell(t[f"cell_r{res}"].to_numpy(), res)
    return t.append_column("hilbert_key", pa.array(key))


def _tile_id_arrow(coff: np.ndarray, roff: np.ndarray) -> pa.Array:
    """``tile_{col}-{row}`` built with Arrow C++ concat kernels (6x
    faster than np.char — measured 0.3s vs 1.9s per 1M rows)."""
    import pyarrow.compute as pc

    return pc.binary_join_element_wise(
        "tile_",
        pc.cast(pa.array(coff), pa.string()),
        "-",
        pc.cast(pa.array(roff), pa.string()),
        "",
    )


class PointTileAssign:
    """Point -> containing tile (offset==0 grid): floor inverse-affine
    (rasterio ``index`` semantics) + key arithmetic.  Stateless but the
    tile-id string build is vectorized once per batch."""

    def __init__(self, cfg: EngineConfig):
        self.raster = cfg.raster
        self.grid = cfg.grid

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..geo.tiles import point_tile_assign

        coff, roff, col, row = point_tile_assign(
            self.raster, self.grid, t["lon"].to_numpy(), t["lat"].to_numpy()
        )
        t = t.append_column("tile_id", _tile_id_arrow(coff, roff))
        t = t.append_column("pix_col", pa.array(col))
        t = t.append_column("pix_row", pa.array(row))
        return t


class FootprintTileClip:
    """The clip join (J1, ``coordinates.py:170-203`` analog): each
    footprint rect -> every intersecting tile, clipped to the tile
    window, plus tile-local integer pixel bbox (rasterio floor
    semantics) and pixel area.

    Footprints are small (< tile), so candidates are the <=2x2 tile
    neighbourhood of the rect's corner tiles — pure key arithmetic,
    vectorized with four masked passes, NO spatial index and NO
    shuffle.  1 -> N row expansion happens inside the batch.
    """

    def __init__(self, cfg: EngineConfig):
        self.raster = cfg.raster
        self.grid = cfg.grid

    def __call__(self, t: pa.Table) -> pa.Table:
        r, g = self.raster, self.grid
        a, _, c, _, e, f = r.transform
        tw, th = g.tile_width, g.tile_height
        n_tx = -(-r.ncols // tw)  # ceil: number of tile columns
        n_ty = -(-r.nrows // th)

        minx = t["fp_minx"].to_numpy()
        miny = t["fp_miny"].to_numpy()
        maxx = t["fp_maxx"].to_numpy()
        maxy = t["fp_maxy"].to_numpy()

        # pixel extent of the rect (floor semantics, y axis flipped)
        c0 = np.floor((minx - c) / a).astype(np.int64)
        c1 = np.floor((maxx - c) / a).astype(np.int64)
        r0 = np.floor((maxy - f) / e).astype(np.int64)  # e < 0: maxy -> smaller row
        r1 = np.floor((miny - f) / e).astype(np.int64)
        ix0, ix1 = c0 // tw, c1 // tw
        iy0, iy1 = r0 // th, r1 // th

        idx_parts, tcol_parts, trow_parts = [], [], []
        for dx in (0, 1):
            for dy in (0, 1):
                ix = ix0 + dx
                iy = iy0 + dy
                m = (ix <= ix1) & (iy <= iy1) & (ix >= 0) & (iy >= 0)
                m &= (ix < n_tx) & (iy < n_ty)
                if not m.any():
                    continue
                idx_parts.append(np.nonzero(m)[0])
                tcol_parts.append(ix[m] * tw)
                trow_parts.append(iy[m] * th)
        if not idx_parts:
            empty = _clip_schema_empty(t)
            return empty
        idx = np.concatenate(idx_parts)
        coff = np.concatenate(tcol_parts)
        roff = np.concatenate(trow_parts)

        # tile spatial bounds (edge tiles clipped to raster extent)
        t_w = np.minimum(coff + tw, r.ncols) - coff
        t_h = np.minimum(roff + th, r.nrows) - roff
        tminx = c + a * coff.astype(np.float64)
        tmaxx = c + a * (coff + t_w).astype(np.float64)
        tmaxy = f + e * roff.astype(np.float64)
        tminy = f + e * (roff + t_h).astype(np.float64)

        cminx = np.maximum(minx[idx], tminx)
        cminy = np.maximum(miny[idx], tminy)
        cmaxx = np.minimum(maxx[idx], tmaxx)
        cmaxy = np.minimum(maxy[idx], tmaxy)
        ok = (cminx < cmaxx) & (cminy < cmaxy)

        idx, coff, roff = idx[ok], coff[ok], roff[ok]
        cminx, cminy, cmaxx, cmaxy = cminx[ok], cminy[ok], cmaxx[ok], cmaxy[ok]
        tx = c + a * coff.astype(np.float64)
        ty = f + e * roff.astype(np.float64)

        # tile-local pixel bbox, rasterio floor semantics
        px0 = np.floor((cminx - tx) / a).astype(np.int64)
        px1 = np.floor((cmaxx - tx) / a).astype(np.int64)
        py0 = np.floor((cmaxy - ty) / e).astype(np.int64)
        py1 = np.floor((cminy - ty) / e).astype(np.int64)

        tile_id = _tile_id_arrow(coff, roff)
        out = t.take(pa.array(idx))
        for name, arr in (
            ("tile_id", tile_id),
            ("clip_minx", cminx),
            ("clip_miny", cminy),
            ("clip_maxx", cmaxx),
            ("clip_maxy", cmaxy),
            ("bbox_x", px0),
            ("bbox_y", py0),
            ("bbox_w", px1 - px0),
            ("bbox_h", py1 - py0),
            ("clip_area", (cmaxx - cminx) * (cmaxy - cminy)),
        ):
            out = out.append_column(
                name, arr if isinstance(arr, pa.Array) else pa.array(arr)
            )
        return out


def _clip_schema_empty(t: pa.Table) -> pa.Table:
    out = t.slice(0, 0)
    for name, typ in (
        ("tile_id", pa.string()),
        ("clip_minx", pa.float64()),
        ("clip_miny", pa.float64()),
        ("clip_maxx", pa.float64()),
        ("clip_maxy", pa.float64()),
        ("bbox_x", pa.int64()),
        ("bbox_y", pa.int64()),
        ("bbox_w", pa.int64()),
        ("bbox_h", pa.int64()),
        ("clip_area", pa.float64()),
    ):
        out = out.append_column(name, pa.array([], type=typ))
    return out


# --------------------------------------------------------------------------
# pipelines
# --------------------------------------------------------------------------

def geocode_pipeline(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """documents -> pages -> geocoded points + footprints."""
    ds = pages_dataset(sf_dir, rep=cfg.pages_rep)
    return ds.map_batches(geocode_batch, batch_format="pyarrow", batch_size=cfg.batch_size)


def cell_index_pipeline(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Geocode + multi-resolution cell encode (H3/S2 analog, T3)."""
    ds = geocode_pipeline(sf_dir, cfg)
    return ds.map_batches(cell_encode_batch, batch_format="pyarrow", batch_size=cfg.batch_size)


def tile_point_join(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Flagship forward join: pages -> geocode -> cell encode -> point
    -> tile assignment.  ``text`` rides along untouched (byte-identity
    invariant)."""
    ds = cell_index_pipeline(sf_dir, cfg)
    return ds.map_batches(
        PointTileAssign(cfg), batch_format="pyarrow", batch_size=cfg.batch_size
    )


def tile_clip_join(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Footprint-vs-tile clip join (J1 analog): 1->N expansion to all
    intersecting tiles with clipped geometry + pixel bbox."""
    ds = geocode_pipeline(sf_dir, cfg)
    return ds.map_batches(
        FootprintTileClip(cfg), batch_format="pyarrow", batch_size=cfg.batch_size
    )


def reproject_pipeline(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """M3 reprojection analog: geocoded points -> EPSG:3857 web
    mercator (closed-form spherical formulas; the reference's pyproj
    call, ``coordinates.py:56-71``).  Fixed-point micrometer keys for
    oracle parity; round-trip error asserted in tests."""
    from ..geo.project import to_mercator

    ds = geocode_pipeline(sf_dir, cfg).select_columns(["page_id", "lon", "lat"])

    def proj(t: pa.Table) -> pa.Table:
        x, y = to_mercator(t["lon"].to_numpy(), t["lat"].to_numpy())
        t = t.append_column(
            "merc_x_mm", pa.array(np.floor(x * 1e3 + 0.5).astype(np.int64))
        )
        t = t.append_column(
            "merc_y_mm", pa.array(np.floor(y * 1e3 + 0.5).astype(np.int64))
        )
        return t

    return ds.map_batches(proj, batch_format="pyarrow", batch_size=cfg.batch_size)


def tile_point_join_shuffle(
    sf_dir: str,
    cfg: EngineConfig = DEFAULT_CFG,
    hot_factor: float = 4.0,
) -> ray.data.Dataset:
    """The LARGE-LARGE physical plan for the tile join: partition
    pages by (coarse cell, salt) and run the join per partition —
    byte-identical output to :func:`tile_point_join` (same oracle),
    different execution shape.

    Skew handling (north rule "explicit skew handling"):
    1. cheap pre-pass: per-cell_r7 counts over a column-pruned
       re-geocode (ids only — no text/html moves);
    2. cells with count > hot_factor x mean are HOT: their rows get
       ``salt = page_id % salt_buckets``, splitting the hot group into
       ``salt_buckets`` shuffle partitions; cold cells keep salt 0;
    3. ``groupby(cell_r7, salt)`` shuffle -> per-group vectorized
       tile assignment; salt is dropped on emit (unsalt).

    At 10^12 rows this is the plan that replaces the broadcast-side
    join when the tile table stops fitting in the object store
    (SURVEY.md §7 step 7); cell_r7 doubles as the write partition key.
    """
    import ray

    from ray.data.aggregate import Count

    # -- skew pre-pass: ids only (prune at the read; nothing wide moves)
    ids_only = pages_dataset(sf_dir, rep=cfg.pages_rep, columns=["page_id"])

    def cell_of(t: pa.Table) -> pa.Table:
        g = geocode_arrays(t["page_id"].to_numpy(zero_copy_only=False))
        cell = cells.encode(g["lon"], g["lat"], 7)
        u, c = np.unique(cell, return_counts=True)
        return pa.table({"cell_r7": pa.array(u), "n": pa.array(c.astype(np.int64))})

    counts = (
        ids_only.map_batches(cell_of, batch_format="pyarrow")
        .groupby("cell_r7")
        .aggregate(Count(alias_name="parts"), ray.data.aggregate.Sum("n", alias_name="n"))
        .to_pandas()
    )
    mean_n = counts["n"].mean() if len(counts) else 0.0
    hot = set(counts.loc[counts["n"] > hot_factor * mean_n, "cell_r7"].tolist())
    hot_ref = ray.put(np.array(sorted(hot), dtype=np.int64))

    ds = cell_index_pipeline(sf_dir, cfg)

    def salt(t: pa.Table) -> pa.Table:
        hot_cells = ray.get(hot_ref)
        cell = t["cell_r7"].to_numpy()
        pid = t["page_id"].to_numpy(zero_copy_only=False)
        s = np.where(
            np.isin(cell, hot_cells), pid % cfg.salt_buckets, 0
        ).astype(np.int64)
        return t.append_column("salt", pa.array(s))

    assigner = PointTileAssign(cfg)

    def join_group(t: pa.Table) -> pa.Table:
        out = assigner(t)
        return out.drop_columns(["salt"])

    return (
        ds.map_batches(salt, batch_format="pyarrow", batch_size=cfg.batch_size)
        .groupby(["cell_r7", "salt"])
        .map_groups(join_group, batch_format="pyarrow")
    )


def _topk_pairs(
    qids: np.ndarray,
    nids: np.ndarray,
    dist: np.ndarray,
    k: int,
) -> pa.Table:
    """(query, neighbor, dist) pairs -> per-query top-k by
    (dist, neighbor_id), ranks 1..k.  Fully vectorized lexsort."""
    order = np.lexsort((nids, dist, qids))
    qs, ns, ds_ = qids[order], nids[order], dist[order]
    # drop duplicate (query, neighbor) pairs (k-ring clamping can emit
    # the same candidate twice); duplicates are adjacent after the sort
    uniq = np.empty(len(qs), dtype=bool)
    uniq[0] = True
    uniq[1:] = (qs[1:] != qs[:-1]) | (ns[1:] != ns[:-1])
    qs, ns, ds_ = qs[uniq], ns[uniq], ds_[uniq]
    # rank within query group
    new_grp = np.empty(len(qs), dtype=bool)
    new_grp[0] = True
    new_grp[1:] = qs[1:] != qs[:-1]
    grp_start = np.maximum.accumulate(np.where(new_grp, np.arange(len(qs)), 0))
    rank = np.arange(len(qs)) - grp_start + 1
    keep = rank <= k
    return pa.table(
        {
            "query_id": pa.array(qs[keep]),
            "rank": pa.array(rank[keep].astype(np.int64)),
            "neighbor_id": pa.array(ns[keep]),
            "dist_m": pa.array(ds_[keep]),
        }
    )


class BruteKnn:
    """Exact kNN: batch queries vs broadcast full index, chunked
    vectorized haversine (numpy), top-k by (dist, neighbor_id).

    Actor-pool stage: the (id, lon, lat) index (24 B/row — the SMALL
    side) arrives as a ``ray.put`` ref resolved ONCE per actor in
    ``__init__``; per batch it is pure numpy.  This is the oracle-exact
    baseline; :class:`KringKnn` is the scale path (SURVEY.md §2 T4).
    """

    def __init__(self, index_ref, k: int):
        import ray

        idx = ray.get(index_ref) if not isinstance(index_ref, dict) else index_ref
        self.ids = idx["ids"]
        self.lon = idx["lon"]
        self.lat = idx["lat"]
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        qids = t["page_id"].to_numpy(zero_copy_only=False)
        qlon = t["lon"].to_numpy()
        qlat = t["lat"].to_numpy()
        k = self.k
        n = len(self.ids)
        parts = []
        chunk = max(1, (1 << 22) // max(n, 1))  # ~4M pair cells per chunk
        for s in range(0, len(qids), chunk):
            e = min(s + chunk, len(qids))
            d = haversine_m(
                qlon[s:e, None], qlat[s:e, None], self.lon[None, :], self.lat[None, :]
            )
            # exclude self by id
            self_mask = qids[s:e, None] == self.ids[None, :]
            d[self_mask] = np.inf
            m = e - s
            if n > k + 1:
                part = np.argpartition(d, k, axis=1)[:, : k + 1]
            else:
                part = np.broadcast_to(np.arange(n), (m, n)).copy()
            rows = np.repeat(np.arange(m), part.shape[1])
            cols = part.ravel()
            dd = d[rows, cols]
            fin = np.isfinite(dd)
            parts.append(
                (
                    qids[s:e][rows[fin]],
                    self.ids[cols[fin]],
                    dd[fin],
                )
            )
        if not parts:
            return _empty_knn()
        qq = np.concatenate([p[0] for p in parts])
        nn = np.concatenate([p[1] for p in parts])
        dd = np.concatenate([p[2] for p in parts])
        if len(qq) == 0:
            return _empty_knn()
        return _topk_pairs(qq, nn, dd, self.k)


class KringKnn:
    """Scale-path kNN: k-ring candidate expansion over the cell-sorted
    index (H3 ``grid_disk`` analog of the reference's tile
    neighbourhoods, ``aerial_conversion/tiles.py:180-256``) +
    vectorized haversine refine.

    Vectorized per batch: ring cells -> ``np.searchsorted`` ranges on
    the cell-sorted index -> pair expansion via np.repeat -> lexsort
    top-k.  Queries whose k-th distance is not provably inside the
    searched ring escalate to a doubled ring (correct-by-construction
    stopping rule would need metric bounds; this stage is documented
    as approximate with recall validated in tests vs BruteKnn).
    """

    def __init__(self, index_ref, k: int, res: int, ring: int = 1, max_ring: int = 64):
        import ray

        idx = ray.get(index_ref) if not isinstance(index_ref, dict) else index_ref
        self.ids = idx["ids"]
        self.lon = idx["lon"]
        self.lat = idx["lat"]
        self.cell_sorted = idx["cell_sorted"]
        self.k = k
        self.res = res
        self.ring = ring
        self.max_ring = max_ring

    def _pairs_for(self, qidx: np.ndarray, qcell: np.ndarray, ring: int):
        rc = cells.kring(qcell, self.res, k=ring)  # (m, (2r+1)^2)
        m, w = rc.shape
        flat = rc.ravel()
        lo = np.searchsorted(self.cell_sorted, flat, side="left")
        hi = np.searchsorted(self.cell_sorted, flat, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return (np.empty(0, np.int64), np.empty(0, np.int64))
        qrep = np.repeat(np.repeat(qidx, w), cnt)
        # candidate index positions: ranges [lo, hi) concatenated
        pos = np.repeat(lo - np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt) + np.arange(total)
        return qrep, pos

    def __call__(self, t: pa.Table) -> pa.Table:
        qids = t["page_id"].to_numpy(zero_copy_only=False)
        qlon = t["lon"].to_numpy()
        qlat = t["lat"].to_numpy()
        qcell = cells.encode(qlon, qlat, self.res)
        nq = len(qids)
        pending = np.arange(nq)
        ring = self.ring
        acc = []
        while len(pending) and ring <= self.max_ring:
            qrep, pos = self._pairs_for(pending, qcell[pending], ring)
            if len(qrep):
                nid = self.ids[pos]
                ok = nid != qids[qrep]
                qrep = qrep[ok]
                cnt_per_q = np.bincount(qrep, minlength=nq)
                done = cnt_per_q[pending] >= self.k
            else:
                done = np.zeros(len(pending), dtype=bool)
            if done.any():
                # boundary guard: emit candidates from DOUBLE the ring
                # that satisfied k, so neighbors just outside the
                # satisfying ring are still considered
                dq = pending[done]
                qrep2, pos2 = self._pairs_for(dq, qcell[dq], min(ring * 2, self.max_ring))
                if len(qrep2):
                    nid2 = self.ids[pos2]
                    ok2 = nid2 != qids[qrep2]
                    qrep2, pos2, nid2 = qrep2[ok2], pos2[ok2], nid2[ok2]
                    d = haversine_m(
                        qlon[qrep2], qlat[qrep2], self.lon[pos2], self.lat[pos2]
                    )
                    acc.append((qids[qrep2], nid2, d))
            pending = pending[~done]
            ring *= 2
        if len(pending):  # exhausted ring budget: brute-force the stragglers
            for qi in pending:
                d = haversine_m(qlon[qi], qlat[qi], self.lon, self.lat)
                ok = self.ids != qids[qi]
                acc.append((np.full(ok.sum(), qids[qi]), self.ids[ok], d[ok]))
        if not acc:
            return _empty_knn()
        qq = np.concatenate([a[0] for a in acc])
        nn = np.concatenate([a[1] for a in acc])
        dd = np.concatenate([a[2] for a in acc])
        if len(qq) == 0:
            return _empty_knn()
        return _topk_pairs(qq, nn, dd, self.k)


def _empty_knn() -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "dist_m": pa.array([], pa.float64()),
        }
    )


def build_point_index(ds: ray.data.Dataset, res: int) -> dict:
    """Collect (id, lon, lat) sorted by cell — the broadcast side of
    the kNN join.  Driver-side materialize is intentional: the index
    is the SMALL side (24 B/row; at 10^12-row scale this becomes the
    per-cell shuffle join instead — SURVEY.md §7 step 7)."""
    tbl = pa.concat_tables(
        list(
            ds.select_columns(["page_id", "lon", "lat"]).iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            )
        )
    )
    ids = tbl["page_id"].to_numpy(zero_copy_only=False)
    lon = tbl["lon"].to_numpy()
    lat = tbl["lat"].to_numpy()
    cell = cells.encode(lon, lat, res)
    order = np.lexsort((ids, cell))
    return {
        "ids": np.ascontiguousarray(ids[order]),
        "lon": np.ascontiguousarray(lon[order]),
        "lat": np.ascontiguousarray(lat[order]),
        "cell_sorted": np.ascontiguousarray(cell[order]),
    }


def knn_pipeline(
    sf_dir: str,
    cfg: EngineConfig = DEFAULT_CFG,
    query_mod: int = 10,
    method: str = "brute",
) -> ray.data.Dataset:
    """kNN of every page with ``page_id % query_mod == 0`` against the
    whole corpus; top-k by (haversine dist, neighbor_id).

    method="brute": exact (oracle-checked).  method="kring": k-ring
    candidate expansion (the 100TB path; approximate, recall tested)."""
    import ray

    geo = geocode_pipeline(sf_dir, cfg)
    index = build_point_index(geo, cfg.cell_res)
    index_ref = ray.put(index)

    def _is_query(t: pa.Table) -> pa.Table:
        return t.filter(
            pa.array(t["page_id"].to_numpy(zero_copy_only=False) % query_mod == 0)
        )

    queries = geo.map_batches(_is_query, batch_format="pyarrow")
    if method == "brute":
        cls, kwargs = BruteKnn, {"index_ref": index_ref, "k": cfg.knn_k}
    else:
        cls, kwargs = KringKnn, {
            "index_ref": index_ref,
            "k": cfg.knn_k,
            "res": cfg.cell_res,
        }
    # pool sized below the CPU count so the upstream read/geocode tasks
    # are never starved (an actor pool reserving every CPU serializes
    # the pipeline — see ray_guide "Stateful stages").
    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    pool = max(1, min(8, ncpu // 2))
    return queries.map_batches(
        cls,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=pool,
    )
