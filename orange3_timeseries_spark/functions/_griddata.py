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


def _locate(points: np.ndarray, tris: np.ndarray, queries: np.ndarray):
    """Containing triangle + barycentric coordinates per query.

    Returns ``(q_sel, t_sel, w)``: query indices that fall inside some
    triangle, their triangle index, and the (m, 3) barycentric weights.
    Ties on shared edges pick one triangle arbitrarily (interpolants
    agree there)."""
    a, b, c = (points[tris[:, 0]], points[tris[:, 1]], points[tris[:, 2]])
    # barycentric solve per (triangle, query); block over queries to bound
    # the T x Q temporary
    det = ((b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0])
           + (c[:, 0] - b[:, 0]) * (a[:, 1] - c[:, 1]))
    ok = np.abs(det) > 1e-300
    q_out, t_out, w_out = [], [], []
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
        first = np.unique(q_idx, return_index=True)[1]
        t_sel, q_sel = t_idx[first], q_idx[first]
        q_out.append(s + q_sel)
        t_out.append(t_sel)
        w_out.append(np.column_stack([w0[t_sel, q_sel], w1[t_sel, q_sel],
                                      w2[t_sel, q_sel]]))
    if not q_out:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
                np.empty((0, 3)))
    return (np.concatenate(q_out), np.concatenate(t_out),
            np.concatenate(w_out))


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
    q_sel, t_sel, w = _locate(points, tris, queries)
    out[q_sel] = (w[:, 0] * values[tris[t_sel, 0]]
                  + w[:, 1] * values[tris[t_sel, 1]]
                  + w[:, 2] * values[tris[t_sel, 2]])
    return out


def estimate_gradients(points: np.ndarray, values: np.ndarray,
                       tris: np.ndarray) -> np.ndarray:
    """Per-node gradient estimates from the triangulation's edge graph:
    weighted least-squares plane fit over each node's neighbors
    (w = 1/dist^2).  Exact for globally linear fields — which is what
    makes the Clough-Tocher interpolant below reproduce linear data
    exactly; degenerate neighborhoods fall back to zero gradient."""
    n = len(points)
    grads = np.zeros((n, 2))
    if not len(tris):
        return grads
    e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    e = np.unique(np.sort(e, axis=1), axis=0)
    # symmetrize: each undirected edge contributes to both endpoints
    src = np.concatenate([e[:, 0], e[:, 1]])
    dst = np.concatenate([e[:, 1], e[:, 0]])
    d = points[dst] - points[src]
    df = values[dst] - values[src]
    w = 1.0 / np.maximum((d ** 2).sum(1), 1e-300)
    sxx = np.bincount(src, w * d[:, 0] * d[:, 0], minlength=n)
    sxy = np.bincount(src, w * d[:, 0] * d[:, 1], minlength=n)
    syy = np.bincount(src, w * d[:, 1] * d[:, 1], minlength=n)
    bx = np.bincount(src, w * d[:, 0] * df, minlength=n)
    by = np.bincount(src, w * d[:, 1] * df, minlength=n)
    det = sxx * syy - sxy * sxy
    ok = np.abs(det) > 1e-12 * np.maximum(sxx + syy, 1e-300) ** 2
    with np.errstate(divide="ignore", invalid="ignore"):
        gx = np.where(ok, (syy * bx - sxy * by) / det, 0.0)
        gy = np.where(ok, (sxx * by - sxy * bx) / det, 0.0)
    grads[:, 0] = np.nan_to_num(gx)
    grads[:, 1] = np.nan_to_num(gy)
    return grads


def _ct_patch_interior(V1, V2, V3, c300, c030, c210, c120, c201, c021):
    """Interior Bezier ordinate c111 of one Clough-Tocher mini-patch from
    the reduced-HCT condensation condition: the cross-boundary (normal)
    derivative along the patch's OUTER edge V1V2 varies linearly, i.e.
    the middle coefficient of the quadratic cross-derivative equals the
    endpoint average (Farin, Curves & Surfaces for CAGD, ch. 17)."""
    # barycentric gradients: rows of inv([[x],[y],[1]] by vertex)
    M = np.linalg.inv(np.array([[V1[0], V2[0], V3[0]],
                                [V1[1], V2[1], V3[1]],
                                [1.0, 1.0, 1.0]]))
    e = V2 - V1
    nrm = np.array([-e[1], e[0]])
    d1, d2, d3 = M[0, :2] @ nrm, M[1, :2] @ nrm, M[2, :2] @ nrm
    return (0.5 * (d1 * (c300 + c120) + d2 * (c210 + c030)
                   + d3 * (c201 + c021))
            - d1 * c210 - d2 * c120) / d3


def _ct_controls(P, f, g):
    """All Bezier ordinates of the three Clough-Tocher mini-patches for
    one macro-triangle: outer ring from values+gradients, per-patch
    interior from edge condensation, wall/center ordinates from the C1
    conditions across the internal walls (which reduce to the closed
    forms below — see the derivation in griddata_cubic's docstring)."""
    P1, P2, P3 = P
    f1, f2, f3 = f
    g1, g2, g3 = g
    Pc = (P1 + P2 + P3) / 3.0
    w1 = f1 + g1 @ (Pc - P1) / 3.0
    w2 = f2 + g2 @ (Pc - P2) / 3.0
    w3 = f3 + g3 @ (Pc - P3) / 3.0
    # outer-edge ring
    a210 = f1 + g1 @ (P2 - P1) / 3.0
    a120 = f2 + g2 @ (P1 - P2) / 3.0
    b210 = f2 + g2 @ (P3 - P2) / 3.0
    b120 = f3 + g3 @ (P2 - P3) / 3.0
    d210 = f3 + g3 @ (P1 - P3) / 3.0
    d120 = f1 + g1 @ (P3 - P1) / 3.0
    a111 = _ct_patch_interior(P1, P2, Pc, f1, f2, a210, a120, w1, w2)
    b111 = _ct_patch_interior(P2, P3, Pc, f2, f3, b210, b120, w2, w3)
    d111 = _ct_patch_interior(P3, P1, Pc, f3, f1, d210, d120, w3, w1)
    u1 = (d111 + a111 + w1) / 3.0
    u2 = (a111 + b111 + w2) / 3.0
    u3 = (b111 + d111 + w3) / 3.0
    z = (u1 + u2 + u3) / 3.0
    # per-patch ordinate tuples, ordered
    # (c300, c030, c003, c210, c120, c201, c102, c021, c012, c111)
    A = (f1, f2, z, a210, a120, w1, u1, w2, u2, a111)
    B = (f2, f3, z, b210, b120, w2, u2, w3, u3, b111)
    D = (f3, f1, z, d210, d120, w3, u3, w1, u1, d111)
    return A, B, D


def _bezier3(c, m1, m2, m3):
    """Cubic triangular Bernstein-Bezier evaluation (vectorized over the
    barycentric arrays m1, m2, m3)."""
    (c300, c030, c003, c210, c120, c201, c102, c021, c012, c111) = c
    return (c300 * m1 ** 3 + c030 * m2 ** 3 + c003 * m3 ** 3
            + 3 * (c210 * m1 ** 2 * m2 + c120 * m1 * m2 ** 2
                   + c201 * m1 ** 2 * m3 + c102 * m1 * m3 ** 2
                   + c021 * m2 ** 2 * m3 + c012 * m2 * m3 ** 2)
            + 6 * c111 * m1 * m2 * m3)


def griddata_cubic(points: np.ndarray, values: np.ndarray,
                   queries: np.ndarray) -> np.ndarray:
    """C1 piecewise-cubic interpolation of scattered 2-D points — the
    scipy-free replacement for ``griddata(method='cubic')``
    (CloughTocher2DInterpolator) used by the reference's multivariate
    pre-pass (``functions.py:314-317``); NaN outside the convex hull.

    Scheme: reduced Hsieh-Clough-Tocher.  Each Delaunay macro-triangle
    splits at its centroid into three cubic Bezier mini-patches.  Corner
    ordinates come from node values, the ordinates adjacent to each
    corner from estimated node gradients (``estimate_gradients``); each
    patch's interior ordinate is fixed by requiring the normal derivative
    along the macro edge to vary linearly (condensation), and the
    remaining wall/center ordinates follow from C1 across the three
    internal walls: with the off-wall vertex at barycentrics (-1,-1,3)
    of the opposing mini-frame, the row conditions collapse to
    ``u_i = (interior_left + interior_right + w_i)/3`` and center
    ``z = (u1+u2+u3)/3``, which also gives a common tangent plane at the
    centroid.  The result interpolates node values, is C1 inside the
    hull, and reproduces linear fields exactly (the gradient estimator
    is exact there).  Differences from scipy are the triangulation's
    co-circular splits and the gradient estimator (scipy minimizes a
    global curvature functional) — both within the scheme's approximation
    class, tested by triangulation-independent invariants."""
    points = np.asarray(points, dtype=float)
    values = np.asarray(values, dtype=float)
    queries = np.asarray(queries, dtype=float)
    out = np.full(len(queries), np.nan)
    if len(points) < 3 or not len(queries):
        return out
    tris = delaunay(points)
    if not len(tris):
        return out
    q_sel, t_sel, w = _locate(points, tris, queries)
    if not len(q_sel):
        return out
    grads = estimate_gradients(points, values, tris)
    for t in np.unique(t_sel):
        m = t_sel == t
        lam = w[m]
        idx = tris[t]
        A, B, D = _ct_controls(points[idx], values[idx], grads[idx])
        # mini-triangle selection: the smallest barycentric coordinate
        # marks the macro edge the query is closest to, i.e. its patch
        sub = lam.argmin(axis=1)
        vals = np.empty(len(lam))
        for s, patch, (i, j) in ((2, A, (0, 1)), (0, B, (1, 2)),
                                 (1, D, (2, 0))):
            sm = sub == s
            if not sm.any():
                continue
            l_min = lam[sm, s]
            m1 = lam[sm, i] - l_min
            m2 = lam[sm, j] - l_min
            m3 = 3.0 * l_min
            vals[sm] = _bezier3(patch, m1, m2, m3)
        out[q_sel[m]] = vals
    return out
