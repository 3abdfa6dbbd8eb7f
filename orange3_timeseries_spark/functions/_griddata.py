"""Scipy-free 2-D scattered linear interpolation — the NumPy replacement
for the reference's ``scipy.interpolate.griddata(..., method='linear')``
call (``functions.py:314-317``): Delaunay-triangulate the defined cells
of the (row, column) index grid, then barycentric-interpolate each NaN
cell inside the convex hull (outside-hull queries stay NaN — the 1-D
pass mops those up, mirroring the reference's two-pass order).

Any valid Delaunay triangulation yields THE SAME interpolant wherever the
data is locally planar, and differs from scipy's Qhull triangulation only
in how co-circular quads (ubiquitous on an integer grid) are diagonal-
split — both choices are valid piecewise-linear interpolants of the same
scattered data.  The invariant tests (tests/test_interpolate.py) therefore
assert triangulation-independent properties: exact reproduction of planar
fields, hull containment, value bounds.

Bowyer-Watson incremental construction with vectorized circumcircle
tests; O(n) triangles live at any time, so an insertion is one O(n)
NumPy pass — fine for the per-series matrices this runs on (the
multivariate pre-pass is a parity corner, not the 100 TB path; the scale
path is the pure-window 1-D tier).
"""

from __future__ import annotations

import numpy as np


def delaunay(pts: np.ndarray) -> np.ndarray:
    """Delaunay triangulation of (n, 2) points via Bowyer-Watson.

    Returns an (m, 3) int array of vertex indices.  Deterministic for a
    fixed input order; co-circular ambiguities resolve by insertion order
    (any resolution is a valid Delaunay triangulation).
    """
    pts = np.asarray(pts, dtype=float)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    mn, mx = pts.min(0), pts.max(0)
    center = (mn + mx) / 2.0
    span = float(max(mx[0] - mn[0], mx[1] - mn[1], 1.0)) * 64.0
    P = np.vstack([pts, [
        [center[0] - 16 * span, center[1] - span],
        [center[0] + 16 * span, center[1] - span],
        [center[0], center[1] + 16 * span]]])
    tris = np.array([[n, n + 1, n + 2]], dtype=np.int64)
    # circumcircle cache (center, r^2) maintained alongside `tris`
    cc, r2 = _circumcircles(P, tris)

    for i in range(n):
        p = P[i]
        bad = ((p[0] - cc[:, 0]) ** 2 + (p[1] - cc[:, 1]) ** 2) <= r2 * (
            1 + 1e-12) + 1e-9
        if not bad.any():
            # numeric corner: point sits outside every circumcircle (can
            # only happen through float round-off) — attach to the nearest
            # triangle's cavity instead of dropping the point
            d = ((p[0] - cc[:, 0]) ** 2 + (p[1] - cc[:, 1]) ** 2) - r2
            bad = np.zeros(len(tris), dtype=bool)
            bad[int(np.argmin(d))] = True
        bad_tris = tris[bad]
        # boundary polygon = edges appearing exactly once among bad tris
        edges = np.concatenate([bad_tris[:, [0, 1]], bad_tris[:, [1, 2]],
                                bad_tris[:, [2, 0]]])
        key = np.sort(edges, axis=1)
        _, first, counts = np.unique(key, axis=0, return_index=True,
                                     return_counts=True)
        boundary = edges[first[counts == 1]]
        new_tris = np.column_stack([
            boundary[:, 0], boundary[:, 1],
            np.full(len(boundary), i, dtype=np.int64)])
        tris = np.concatenate([tris[~bad], new_tris])
        new_cc, new_r2 = _circumcircles(P, new_tris)
        cc = np.concatenate([cc[~bad], new_cc])
        r2 = np.concatenate([r2[~bad], new_r2])

    keep = (tris < n).all(axis=1)
    return tris[keep]


def _circumcircles(P: np.ndarray, tris: np.ndarray):
    """Vectorized circumcircle (center, radius^2) per triangle; degenerate
    (collinear) triangles get an empty circle (r^2 = -inf) so they never
    capture points."""
    a, b, c = P[tris[:, 0]], P[tris[:, 1]], P[tris[:, 2]]
    ab = b - a
    ac = c - a
    d = 2.0 * (ab[:, 0] * ac[:, 1] - ab[:, 1] * ac[:, 0])
    with np.errstate(divide="ignore", invalid="ignore"):
        ab2 = (ab ** 2).sum(1)
        ac2 = (ac ** 2).sum(1)
        ux = (ac[:, 1] * ab2 - ab[:, 1] * ac2) / d
        uy = (ab[:, 0] * ac2 - ac[:, 0] * ab2) / d
    center = a + np.column_stack([ux, uy])
    r2 = ((center - a) ** 2).sum(1)
    degen = ~np.isfinite(r2) | (np.abs(d) < 1e-300)
    center = np.where(degen[:, None], a, center)
    r2 = np.where(degen, -np.inf, r2)
    return center, r2


def griddata_linear(points: np.ndarray, values: np.ndarray,
                    queries: np.ndarray) -> np.ndarray:
    """Piecewise-linear interpolation of scattered 2-D ``points`` ->
    ``values`` at ``queries``; NaN outside the convex hull (scipy
    ``griddata(method='linear')`` semantics)."""
    points = np.asarray(points, dtype=float)
    values = np.asarray(values, dtype=float)
    queries = np.asarray(queries, dtype=float)
    out = np.full(len(queries), np.nan)
    if len(points) < 3 or not len(queries):
        return out
    tris = delaunay(points)
    if not len(tris):
        return out
    a, b, c = (points[tris[:, 0]], points[tris[:, 1]], points[tris[:, 2]])
    # barycentric solve per (triangle, query); block over queries to bound
    # the T x Q temporary
    det = ((b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0])
           + (c[:, 0] - b[:, 0]) * (a[:, 1] - c[:, 1]))
    ok = np.abs(det) > 1e-300
    block = max(1, int(4_000_000 // max(len(tris), 1)))
    for s in range(0, len(queries), block):
        q = queries[s:s + block]
        dx = q[None, :, 0] - c[:, None, 0]
        dy = q[None, :, 1] - c[:, None, 1]
        with np.errstate(divide="ignore", invalid="ignore"):
            w0 = ((b[:, None, 1] - c[:, None, 1]) * dx
                  + (c[:, None, 0] - b[:, None, 0]) * dy) / det[:, None]
            w1 = ((c[:, None, 1] - a[:, None, 1]) * dx
                  + (a[:, None, 0] - c[:, None, 0]) * dy) / det[:, None]
        w2 = 1.0 - w0 - w1
        eps = 1e-9
        inside = (ok[:, None] & (w0 >= -eps) & (w1 >= -eps) & (w2 >= -eps))
        t_idx, q_idx = np.nonzero(inside)
        if not len(t_idx):
            continue
        # first containing triangle per query (ties on shared edges give
        # identical interpolants, so any pick is fine)
        first = np.unique(q_idx, return_index=True)[1]
        t_sel, q_sel = t_idx[first], q_idx[first]
        v = (w0[t_sel, q_sel] * values[tris[t_sel, 0]]
             + w1[t_sel, q_sel] * values[tris[t_sel, 1]]
             + w2[t_sel, q_sel] * values[tris[t_sel, 2]])
        out[s + q_sel] = v
    return out
