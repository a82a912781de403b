"""Pure-numpy polygon kernels: bbox, area, point-in-polygon, rectangle
clip, simplify.  (No GEOS in this environment — these replace the
reference's shapely calls with vectorized equivalents.)

Polygons are (N, 2) float64 arrays of exterior-ring vertices, open
(first vertex NOT repeated at the end) unless noted.
"""

from __future__ import annotations

import numpy as np


def shoelace_area(coords: np.ndarray) -> float:
    """Unsigned polygon area (shapely ``Polygon(...).area`` analog used
    by ``aerial_conversion/coco.py:258`` for annotation area)."""
    c = np.asarray(coords, dtype=np.float64)
    x, y = c[:, 0], c[:, 1]
    yr = np.concatenate([y[1:], y[:1]])
    xr = np.concatenate([x[1:], x[:1]])
    return 0.5 * abs(float(np.dot(x, yr) - np.dot(y, xr)))


def shoelace_area_batch(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Vectorized areas for many polygons stored as one flat (M, 2)
    coord array + int offsets (len P+1), i.e. Arrow list layout."""
    x, y = flat[:, 0], flat[:, 1]
    cross = x * np.roll(y, -1) - y * np.roll(x, -1)
    # fix wrap terms at ring boundaries: the closing edge of polygon p
    # is (last_p -> first_p), not (last_p -> first_{p+1}); EMPTY rings
    # must not touch the previous ring's closing term.
    valid = offsets[1:] > offsets[:-1]
    ends = offsets[1:][valid] - 1
    starts = offsets[:-1][valid]
    cross[ends] = x[ends] * y[starts] - y[ends] * x[starts]
    csum = np.concatenate([[0.0], np.cumsum(cross)])
    return 0.5 * np.abs(csum[offsets[1:]] - csum[offsets[:-1]])


def bbox(coords: np.ndarray) -> tuple[float, float, float, float]:
    """COCO bbox [minx, miny, w, h] of a polygon
    (``aerial_conversion/coco.py:221-241`` semantics)."""
    c = np.asarray(coords, dtype=np.float64)
    minx, miny = c[:, 0].min(), c[:, 1].min()
    maxx, maxy = c[:, 0].max(), c[:, 1].max()
    return float(minx), float(miny), float(maxx - minx), float(maxy - miny)


def points_in_polygon(px: np.ndarray, py: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting: are points inside ``poly``?

    Replaces shapely ``contains`` / ``intersects`` point tests (the
    STRtree stage pairs this with a grid-bucket candidate index).
    Boundary behavior: half-open (consistent, deterministic).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    poly = np.asarray(poly, dtype=np.float64)
    x1, y1 = poly[:, 0], poly[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    inside = np.zeros(px.shape, dtype=bool)
    for i in range(len(poly)):
        cond = (y1[i] > py) != (y2[i] > py)
        if not cond.any():
            continue
        xint = (x2[i] - x1[i]) * (py - y1[i]) / (y2[i] - y1[i]) + x1[i]
        inside ^= cond & (px < xint)
    return inside


def clip_to_rect(
    coords: np.ndarray, minx: float, miny: float, maxx: float, maxy: float
) -> np.ndarray:
    """Sutherland–Hodgman clip of a convex-or-concave polygon to an
    axis-aligned rectangle (``gpd.clip`` analog for the per-tile clip
    join, ``aerial_conversion/coordinates.py:170-203``).

    Returns an (M, 2) array (possibly empty).
    """
    out = np.asarray(coords, dtype=np.float64)
    for axis, bound, keep_ge in (
        (0, minx, True),
        (0, maxx, False),
        (1, miny, True),
        (1, maxy, False),
    ):
        if len(out) == 0:
            return out.reshape(0, 2)
        cur = out
        prev = np.roll(cur, 1, axis=0)
        if keep_ge:
            cur_in = cur[:, axis] >= bound
            prev_in = prev[:, axis] >= bound
        else:
            cur_in = cur[:, axis] <= bound
            prev_in = prev[:, axis] <= bound
        pts = []
        for i in range(len(cur)):
            if cur_in[i]:
                if not prev_in[i]:
                    pts.append(_isect(prev[i], cur[i], axis, bound))
                pts.append(cur[i])
            elif prev_in[i]:
                pts.append(_isect(prev[i], cur[i], axis, bound))
        out = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    return out


def _isect(p: np.ndarray, q: np.ndarray, axis: int, bound: float) -> np.ndarray:
    t = (bound - p[axis]) / (q[axis] - p[axis])
    r = p + t * (q - p)
    r[axis] = bound
    return r


def rect_clip_rect(
    rminx: np.ndarray,
    rminy: np.ndarray,
    rmaxx: np.ndarray,
    rmaxy: np.ndarray,
    minx: float,
    miny: float,
    maxx: float,
    maxy: float,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized rect∩rect: returns (minx, miny, maxx, maxy, nonempty)
    for many rectangles clipped against one rectangle — the fast path
    for axis-aligned footprints (the synthetic corpus) so the clip
    join never leaves numpy."""
    cminx = np.maximum(rminx, minx)
    cminy = np.maximum(rminy, miny)
    cmaxx = np.minimum(rmaxx, maxx)
    cmaxy = np.minimum(rmaxy, maxy)
    ok = (cminx < cmaxx) & (cminy < cmaxy)
    return cminx, cminy, cmaxx, cmaxy, ok


def clip_rings_to_rects(
    flat: np.ndarray,
    offsets: np.ndarray,
    rminx: np.ndarray,
    rminy: np.ndarray,
    rmaxx: np.ndarray,
    rmaxy: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """BATCHED Sutherland–Hodgman: clip MANY polygon rings, each to its
    OWN axis-aligned rectangle, fully vectorized (no per-ring Python).

    ``flat`` is (total_vertices, 2) float64, ``offsets`` (n_rings+1)
    int64 — Arrow list layout, rings open (no repeated last vertex).
    ``r*`` are per-ring rect bounds.  Returns (flat', offsets') in the
    same layout; clipped-away rings become empty (offsets'[i] ==
    offsets'[i+1]).

    Per half-plane pass: the ring-local predecessor index is pure
    index arithmetic (prev = j-1, ring starts wrap to ring ends), each
    edge emits 0-2 points (crossing intersection first, then the
    inside vertex), and emit positions come from one exclusive cumsum
    — the same flat+offsets segmented-kernel idiom as the text/hash
    stages.  Semantically identical to :func:`clip_to_rect` per ring
    (asserted in tests).
    """
    V = np.asarray(flat, dtype=np.float64)
    offs = np.asarray(offsets, dtype=np.int64)
    for axis, bounds, keep_ge in (
        (0, rminx, True),
        (0, rmaxx, False),
        (1, rminy, True),
        (1, rmaxy, False),
    ):
        n = len(offs) - 1
        total = len(V)
        if total == 0:
            break
        counts = offs[1:] - offs[:-1]
        ring_of = np.repeat(np.arange(n), counts)
        bound_v = np.asarray(bounds, dtype=np.float64)[ring_of]
        prev_idx = np.arange(total) - 1
        nonempty = counts > 0
        prev_idx[offs[:-1][nonempty]] = offs[1:][nonempty] - 1
        cur = V
        prev = V[prev_idx]
        if keep_ge:
            cur_in = cur[:, axis] >= bound_v
            prev_in = prev[:, axis] >= bound_v
        else:
            cur_in = cur[:, axis] <= bound_v
            prev_in = prev[:, axis] <= bound_v
        cross = cur_in != prev_in
        n_out = cur_in.astype(np.int64) + cross.astype(np.int64)
        start = np.concatenate([[0], np.cumsum(n_out)[:-1]])
        m = int(n_out.sum())
        out = np.empty((m, 2), dtype=np.float64)
        # crossing intersection point goes first
        if cross.any():
            ci = np.nonzero(cross)[0]
            p, q = prev[ci], cur[ci]
            b = bound_v[ci]
            t = (b - p[:, axis]) / (q[:, axis] - p[:, axis])
            pt = p + t[:, None] * (q - p)
            pt[:, axis] = b
            out[start[ci]] = pt
        # inside current vertex next
        if cur_in.any():
            vi = np.nonzero(cur_in)[0]
            out[start[vi] + cross[vi]] = cur[vi]
        per_ring = np.bincount(ring_of, weights=n_out, minlength=n).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(per_ring)])
        V = out
    return V, offs


def douglas_peucker(coords: np.ndarray, tol: float) -> np.ndarray:
    """Ramer–Douglas–Peucker simplification (shapely ``simplify``
    analog for the regularisation dispatcher,
    ``aerial_conversion/coco.py:416-450``).  Iterative stack, exact
    perpendicular-distance criterion."""
    c = np.asarray(coords, dtype=np.float64)
    if len(c) < 3:
        return c
    keep = np.zeros(len(c), dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(c) - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = c[j] - c[i]
        seglen = np.hypot(seg[0], seg[1])
        pts = c[i + 1 : j]
        if seglen == 0.0:
            d = np.hypot(pts[:, 0] - c[i][0], pts[:, 1] - c[i][1])
        else:
            dp = pts - c[i]
            # 2-D cross product spelled out: np.cross pays moveaxis/
            # axis-normalization overhead per call on tiny arrays
            d = np.abs(seg[0] * dp[:, 1] - seg[1] * dp[:, 0]) / seglen
        k = int(np.argmax(d))
        if d[k] > tol:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return c[keep]


def min_rotated_rect(coords: np.ndarray) -> np.ndarray:
    """Minimum-area rotated rectangle via rotating calipers over the
    convex hull (shapely ``minimum_rotated_rectangle`` analog,
    dispatcher at ``aerial_conversion/coco.py:433-436``).  Returns
    (4, 2) corners."""
    hull = convex_hull(coords)
    if len(hull) < 3:
        mnx, mny, w, h = bbox(coords)
        return np.array(
            [[mnx, mny], [mnx + w, mny], [mnx + w, mny + h], [mnx, mny + h]]
        )
    best_area, best = np.inf, None
    edges = np.roll(hull, -1, axis=0) - hull
    angles = np.unique(np.mod(np.arctan2(edges[:, 1], edges[:, 0]), np.pi / 2))
    for ang in angles:
        ca, sa = np.cos(ang), np.sin(ang)
        rot = hull @ np.array([[ca, sa], [-sa, ca]])
        mn, mx = rot.min(axis=0), rot.max(axis=0)
        area = float((mx[0] - mn[0]) * (mx[1] - mn[1]))
        if area < best_area:
            best_area = area
            corners = np.array(
                [[mn[0], mn[1]], [mx[0], mn[1]], [mx[0], mx[1]], [mn[0], mx[1]]]
            )
            best = corners @ np.array([[ca, -sa], [sa, ca]])
    return best


def dominant_angle(coords: np.ndarray) -> float:
    """Length-weighted circular mean of edge directions folded into
    [0, 90): the polygon's dominant grid orientation.  Used by
    :func:`orthogonalise` (reference semantics source:
    ``orthogonalise/orthogonalise.py:181-354`` — re-derived from the
    public JOSM orthogonalise idea, NOT copied; the vendored original
    is GPLv3)."""
    c = np.asarray(coords, dtype=np.float64)
    edges = np.concatenate([c[1:], c[:1]]) - c
    lens = np.hypot(edges[:, 0], edges[:, 1])
    ang = np.arctan2(edges[:, 1], edges[:, 0])  # (-pi, pi]
    # fold into 90-degree symmetry class and take the weighted circular
    # mean on the 4x-angle circle (so 0 and 90 degrees coincide)
    s = np.sum(lens * np.sin(4.0 * ang))
    co = np.sum(lens * np.cos(4.0 * ang))
    return float(np.mod(np.arctan2(s, co) / 4.0, np.pi / 2.0))


def orthogonalise(
    coords: np.ndarray, max_angle_change_deg: float = 15.0
) -> np.ndarray:
    """Snap a building-like polygon's edges to 0/90 degrees relative
    to its dominant orientation (JOSM-style orthogonalisation,
    re-derived; dispatcher semantics of
    ``aerial_conversion/coco.py:416-450``).

    Algorithm: rotate by -theta (dominant angle); classify each edge H
    or V by |dx| vs |dy|; edges deviating more than
    ``max_angle_change_deg`` from their axis leave the polygon
    unchanged (bail out, like the reference's skew tolerance); merge
    consecutive same-axis edges; new vertices are the intersections of
    consecutive snapped axis lines (H: y = length-weighted mean of
    endpoints, V: x = ...); rotate back.  Deterministic, pure numpy.
    Returns the original ring if orthogonalisation is not applicable
    (degenerate or over-tolerance).
    """
    c = np.asarray(coords, dtype=np.float64)
    if len(c) < 3:
        return c
    theta = dominant_angle(c)
    ca, sa = np.cos(-theta), np.sin(-theta)
    rot = c @ np.array([[ca, sa], [-sa, ca]])
    rot_nxt = np.concatenate([rot[1:], rot[:1]])
    edges = rot_nxt - rot
    lens = np.hypot(edges[:, 0], edges[:, 1])
    if np.any(lens == 0.0):
        return c
    ang = np.degrees(np.arctan2(edges[:, 1], edges[:, 0]))
    dev_h = np.minimum(np.abs(np.mod(ang, 180.0)), np.abs(180.0 - np.mod(ang, 180.0)))
    dev_v = np.abs(90.0 - np.mod(ang, 180.0))
    is_h = dev_h <= dev_v
    dev = np.where(is_h, dev_h, dev_v)
    if np.any(dev > max_angle_change_deg):
        return c
    # merge consecutive edges of the same axis class into runs
    n = len(rot)
    runs: list[tuple[bool, list[int]]] = []
    for i in range(n):
        if runs and runs[-1][0] == is_h[i]:
            runs[-1][1].append(i)
        else:
            runs.append((bool(is_h[i]), [i]))
    if len(runs) > 1 and runs[0][0] == runs[-1][0]:  # wraparound merge
        runs[0] = (runs[0][0], runs[-1][1] + runs[0][1])
        runs.pop()
    if len(runs) < 4:
        return c  # cannot form a closed orthogonal ring
    # snapped coordinate of each run: length-weighted mean of the
    # constant axis over the run's edges
    levels = []
    for horiz, idxs in runs:
        w = lens[idxs]
        if horiz:  # horizontal edge: constant y
            vals = 0.5 * (rot[idxs, 1] + rot_nxt[idxs, 1])
        else:  # vertical: constant x
            vals = 0.5 * (rot[idxs, 0] + rot_nxt[idxs, 0])
        # same expression np.average evaluates (sum(v*w)/sum(w)),
        # without its per-call dispatch overhead
        levels.append(float(np.multiply(vals, w).sum() / w.sum()))
    # vertices = intersections of consecutive run lines
    m = len(runs)
    out = np.empty((m, 2), dtype=np.float64)
    for j in range(m):
        horiz_a, _ = runs[j - 1]
        la, lb = levels[j - 1], levels[j]
        # consecutive runs always alternate axis after merging
        if horiz_a:  # prev horizontal (y = la), current vertical (x = lb)
            out[j] = (lb, la)
        else:
            out[j] = (la, lb)
    ca2, sa2 = np.cos(theta), np.sin(theta)
    return out @ np.array([[ca2, sa2], [-sa2, ca2]])


def orthogonalise_rings(
    rings: list[np.ndarray], max_angle_change_deg: float = 15.0
) -> list[np.ndarray]:
    """Orthogonalise a polygon WITH interior rings: each ring —
    exterior and every hole — is snapped independently, exactly the
    reference's per-ring loop (``orthogonalise/orthogonalise.py:209-212``
    builds ``rings = [exterior] + interiors`` and orthogonalises each
    as its own polygon).  ``rings[0]`` is the exterior; order is
    preserved.  Rings that bail (over-tolerance/degenerate) come back
    unchanged, matching :func:`orthogonalise`'s single-ring
    behavior."""
    return [orthogonalise(r, max_angle_change_deg) for r in rings]


_PAIR_IDX: dict[int, tuple] = {}


def _pair_index_cache(n: int) -> tuple:
    """(nxt, i, j) non-adjacent edge-pair indices for an n-ring,
    memoized — rings in a batch overwhelmingly share a handful of
    sizes, and triu_indices is the hot allocation otherwise."""
    got = _PAIR_IDX.get(n)
    if got is None:
        nxt = np.roll(np.arange(n), -1)
        i, j = np.triu_indices(n, k=2)
        adj = (nxt[j] == i) | (nxt[i] == j)
        got = (nxt, i[~adj], j[~adj])
        if len(_PAIR_IDX) < 4096:
            _PAIR_IDX[n] = got
    return got


def has_self_intersection(coords: np.ndarray) -> bool:
    """Vectorized proper-crossing test between all non-adjacent edge
    pairs of a ring (open or closed input).  The cheap gate before
    :func:`repair_ring` — simple polygons pay ~5 numpy ops here and
    never enter the repair path."""
    c = np.asarray(coords, dtype=np.float64)
    if len(c) >= 2 and (c[0] == c[-1]).all():
        c = c[:-1]
    n = len(c)
    if n < 4:
        return False
    nxt, i, j = _pair_index_cache(n)
    p, r = c[i], c[nxt[i]] - c[i]
    q, s = c[j], c[nxt[j]] - c[j]
    denom = r[:, 0] * s[:, 1] - r[:, 1] * s[:, 0]
    qp = q - p
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (qp[:, 0] * s[:, 1] - qp[:, 1] * s[:, 0]) / denom
        u = (qp[:, 0] * r[:, 1] - qp[:, 1] * r[:, 0]) / denom
    eps = 1e-12
    hit = (denom != 0) & (t > eps) & (t < 1 - eps) & (u > eps) & (u < 1 - eps)
    return bool(hit.any())


def repair_ring(coords: np.ndarray) -> list[np.ndarray]:
    """Untwist a self-intersecting ring into SIMPLE loops — the
    reference repairs invalid rings with ``buffer(0)`` /
    ``make_valid`` before orthogonalising
    (``orthogonalise/orthogonalise.py:219-231``); this is the
    library-free equivalent: proper crossings between non-adjacent
    edges become explicit path vertices, then the closed path is
    recursively split at any crossing visited twice within one loop
    (a bowtie yields its two triangles, like ``make_valid``'s
    MultiPolygon).  Splitting at a crossing never creates new
    geometry — both sub-loops close exactly at the shared crossing
    point, so every edge of every output loop is a sub-segment of an
    input edge and all remaining crossings are explicit vertices;
    hence every output loop is simple, including fully interleaved
    cases like a pentagram.  Simple inputs return ``[ring]``
    unchanged.  Loops with zero area are dropped."""
    c = np.asarray(coords, dtype=np.float64)
    if len(c) >= 2 and (c[0] == c[-1]).all():
        c = c[:-1]
    n = len(c)
    if n < 4 or not has_self_intersection(c):
        return [c]
    eps = 1e-12
    per_edge: dict[int, list] = {}
    pts: dict[tuple, np.ndarray] = {}
    for i in range(n):
        ri = c[(i + 1) % n] - c[i]
        for j in range(i + 2, n):
            if (j + 1) % n == i:
                continue  # wrap-adjacent
            sj = c[(j + 1) % n] - c[j]
            denom = ri[0] * sj[1] - ri[1] * sj[0]
            if denom == 0.0:
                continue
            qp = c[j] - c[i]
            t = (qp[0] * sj[1] - qp[1] * sj[0]) / denom
            u = (qp[0] * ri[1] - qp[1] * ri[0]) / denom
            if eps < t < 1 - eps and eps < u < 1 - eps:
                key = (i, j)
                pts[key] = c[i] + t * ri  # ONE point object for both edges
                per_edge.setdefault(i, []).append((t, key))
                per_edge.setdefault(j, []).append((u, key))
    path: list[tuple] = []
    for i in range(n):
        path.append((("v", i), c[i]))
        for t, key in sorted(per_edge.get(i, []), key=lambda x: x[0]):
            path.append((("x", key), pts[key]))
    loops: list[np.ndarray] = []
    work: list[list] = [path]
    while work:
        p = work.pop()
        first: dict[tuple, int] = {}
        split = None
        for pos, (tag, _) in enumerate(p):
            if tag[0] != "x":
                continue
            if tag in first:
                split = (first[tag], pos)
                break
            first[tag] = pos
        if split is None:
            loops.append(np.asarray([pt for _, pt in p]))
            continue
        i0, j0 = split
        # both keep ONE copy of the crossing point, so both close there
        work.append(p[i0:j0])
        work.append(p[: i0 + 1] + p[j0 + 1 :])
    out = [l for l in loops if len(l) >= 3 and shoelace_area(l) > 0.0]
    return out if out else [c]


def rect_union_area(rects: np.ndarray) -> float:
    """Exact union area of axis-aligned rectangles [(minx, miny, maxx,
    maxy), ...] via x-coordinate compression + per-strip y-interval
    sweep.  The zone-merge aggregate kernel (``unary_union`` analog,
    ``scripts/coco2geojson.py:104-156``) for the rectangular-footprint
    corpus — associative by construction, so per-cell partial rect
    LISTS union safely into the per-zone final (two-level plan,
    SURVEY.md §2e A2)."""
    r = np.asarray(rects, dtype=np.float64).reshape(-1, 4)
    r = r[(r[:, 2] > r[:, 0]) & (r[:, 3] > r[:, 1])]
    if len(r) == 0:
        return 0.0
    xs = np.unique(np.concatenate([r[:, 0], r[:, 2]]))
    total = 0.0
    for i in range(len(xs) - 1):
        x0, x1 = xs[i], xs[i + 1]
        sel = (r[:, 0] <= x0) & (r[:, 2] >= x1)
        if not sel.any():
            continue
        ys = r[sel][:, [1, 3]]
        order = np.argsort(ys[:, 0], kind="mergesort")
        ys = ys[order]
        covered = 0.0
        cur_lo, cur_hi = ys[0, 0], ys[0, 1]
        for lo, hi in ys[1:]:
            if lo > cur_hi:
                covered += cur_hi - cur_lo
                cur_lo, cur_hi = lo, hi
            else:
                cur_hi = max(cur_hi, hi)
        covered += cur_hi - cur_lo
        total += covered * (x1 - x0)
    return float(total)


def convex_hull(coords: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain convex hull, CCW, no repeated last pt."""
    pts = np.unique(np.asarray(coords, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    # lexicographic sort is given by np.unique on rows
    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])
