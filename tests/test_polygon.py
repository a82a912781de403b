import numpy as np

from aerial_conversion_ray.geo import polygon, wkb


def test_shoelace_square():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    assert polygon.shoelace_area(sq) == 4.0


def test_shoelace_batch_matches_single():
    rng = np.random.default_rng(5)
    polys = [rng.uniform(0, 10, (n, 2)) for n in (3, 5, 8, 4)]
    flat = np.vstack(polys)
    offsets = np.cumsum([0] + [len(p) for p in polys])
    batch = polygon.shoelace_area_batch(flat, np.asarray(offsets))
    single = np.array([polygon.shoelace_area(p) for p in polys])
    assert np.allclose(batch, single)


def test_bbox_coco_semantics():
    # [minx, miny, w, h] like aerial_conversion/coco.py:221-241
    tri = np.array([[1, 2], [5, 3], [3, 7]], dtype=float)
    assert polygon.bbox(tri) == (1.0, 2.0, 4.0, 5.0)


def test_points_in_polygon_square():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    px = np.array([5.0, 15.0, -1.0, 9.99])
    py = np.array([5.0, 5.0, 5.0, 9.99])
    assert polygon.points_in_polygon(px, py, sq).tolist() == [True, False, False, True]


def test_points_in_concave_polygon():
    # L-shape
    L = np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4]], dtype=float)
    inside = polygon.points_in_polygon(
        np.array([0.5, 2.0, 3.0]), np.array([2.0, 2.0, 0.5]), L
    )
    assert inside.tolist() == [True, False, True]


def test_clip_to_rect():
    tri = np.array([[0, 0], [10, 0], [0, 10]], dtype=float)
    out = polygon.clip_to_rect(tri, 0, 0, 5, 5)
    assert polygon.shoelace_area(out) == 5 * 5 - 0.5 * 5 * 5 + 12.5  # = 25
    # fully outside
    assert len(polygon.clip_to_rect(tri, 20, 20, 30, 30)) == 0


def test_rect_clip_rect_vectorized():
    minx, miny, maxx, maxy, ok = polygon.rect_clip_rect(
        np.array([0.0, 8.0]), np.array([0.0, 8.0]),
        np.array([4.0, 12.0]), np.array([4.0, 12.0]),
        2.0, 2.0, 10.0, 10.0,
    )
    assert ok.tolist() == [True, True]
    assert (maxx - minx).tolist() == [2.0, 2.0]


def test_douglas_peucker_collinear():
    line = np.array([[0, 0], [1, 0.001], [2, 0], [3, 0.001], [4, 0]], dtype=float)
    out = polygon.douglas_peucker(line, 0.01)
    assert len(out) == 2


def test_min_rotated_rect_area():
    rng = np.random.default_rng(11)
    pts = rng.uniform(0, 1, (30, 2)) @ np.array([[2.0, 1.0], [-1.0, 2.0]])
    rect = polygon.min_rotated_rect(pts)
    assert rect.shape == (4, 2)
    hull = polygon.convex_hull(pts)
    assert polygon.shoelace_area(rect) >= polygon.shoelace_area(hull) - 1e-9


def test_wkb_roundtrip():
    lon = np.array([1.5, -120.25])
    lat = np.array([-33.0, 45.5])
    pts = wkb.encode_points(lon, lat)
    dlon, dlat = wkb.decode_points(pts)
    assert np.array_equal(dlon, lon) and np.array_equal(dlat, lat)

    rects = wkb.encode_rects(
        np.array([0.0]), np.array([1.0]), np.array([2.0]), np.array([3.0])
    )
    ring = wkb.decode_polygon(rects[0])
    assert ring.shape == (5, 2)
    mnx, mny, mxx, mxy = wkb.decode_rects(rects)
    assert (mnx[0], mny[0], mxx[0], mxy[0]) == (0.0, 1.0, 2.0, 3.0)
