"""Vectorized planar geometry kernels (pure numpy).

Replaces shapely's ``contains`` / ``distance`` as used inside GeoPandas
``sjoin`` / ``sjoin_nearest`` (/root/reference/geocode/utilities.py:266-284)
with batch numpy suitable for Arrow-vectorized pandas UDF execution.

Polygons are stored flattened: ``xs``/``ys`` float64 arrays of all ring
vertices concatenated, plus ``ring_offsets`` (int array, len n_rings+1) of
start offsets into xs/ys. Rings need not be closed (first point is treated
as following the last). Even-odd (ray crossing) semantics: holes are just
additional rings; multipolygon parts likewise.
"""

from __future__ import annotations

import numpy as np


def _ring_edges(xs, ys, ring_offsets):
    """Edge arrays (x1, y1, x2, y2) for all rings, closing each ring."""
    x1s, y1s, x2s, y2s = [], [], [], []
    for r in range(len(ring_offsets) - 1):
        a, b = ring_offsets[r], ring_offsets[r + 1]
        rx = xs[a:b]
        ry = ys[a:b]
        if len(rx) < 2:
            continue
        # drop explicit closure duplicate if present
        if rx[0] == rx[-1] and ry[0] == ry[-1]:
            rx = rx[:-1]
            ry = ry[:-1]
        if len(rx) < 3:
            continue
        x1s.append(rx)
        y1s.append(ry)
        x2s.append(np.roll(rx, -1))
        y2s.append(np.roll(ry, -1))
    if not x1s:
        z = np.empty(0, dtype=np.float64)
        return z, z, z, z
    return (np.concatenate(x1s), np.concatenate(y1s),
            np.concatenate(x2s), np.concatenate(y2s))


def points_in_polygon(px, py, xs, ys, ring_offsets, chunk: int = 4096) -> np.ndarray:
    """Even-odd ray-cast: bool mask of points inside the polygon.

    Broadcast is (points x edges); chunked over points to bound memory.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x1, y1, x2, y2 = _ring_edges(np.asarray(xs, float), np.asarray(ys, float),
                                 np.asarray(ring_offsets, int))
    out = np.zeros(px.shape[0], dtype=bool)
    if x1.size == 0:
        return out
    for s in range(0, px.shape[0], chunk):
        e = min(s + chunk, px.shape[0])
        pxx = px[s:e, None]
        pyy = py[s:e, None]
        # edge straddles the horizontal ray through pyy
        cond = (y1[None, :] > pyy) != (y2[None, :] > pyy)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1[None, :] + (pyy - y1[None, :]) / (y2[None, :] - y1[None, :]) * (
                x2[None, :] - x1[None, :]
            )
        crossings = (cond & (pxx < xint)).sum(axis=1)
        out[s:e] = (crossings % 2) == 1
    return out


def _dist_kernel(px, py, xs, ys, ring_offsets, chunk: int,
                 metric: bool) -> np.ndarray:
    """Shared min point-to-boundary segment-distance kernel.

    ``metric=False``: planar units of the input coordinates.
    ``metric=True``: local equirectangular METRES — x-differences (point
    offsets AND edge vectors) are scaled by cos(lat_point) before the
    projection, so the clamped foot-point is the true nearest point of the
    scaled space; the result is multiplied by METERS_PER_DEG.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x1, y1, x2, y2 = _ring_edges(np.asarray(xs, float), np.asarray(ys, float),
                                 np.asarray(ring_offsets, int))
    out = np.full(px.shape[0], np.inf)
    if x1.size == 0:
        return out
    ex = x2 - x1
    ey = y2 - y1
    if not metric:
        # planar fast path: edge geometry is point-independent, so edge
        # vectors and squared lengths are 1-D and computed ONCE
        elen2 = ex * ex + ey * ey
        elen2 = np.where(elen2 == 0.0, 1.0, elen2)
    for s in range(0, px.shape[0], chunk):
        e = min(s + chunk, px.shape[0])
        dys = py[s:e, None] - y1[None, :]
        if metric:
            # per-point anisotropic scale S = diag(cos(lat), 1): edge
            # vectors (and their lengths) become point-dependent matrices
            c = np.cos(np.radians(py[s:e]))[:, None]
            dxs = (px[s:e, None] - x1[None, :]) * c
            exs = ex[None, :] * c
            el2 = exs * exs + ey[None, :] * ey[None, :]
            el2 = np.where(el2 == 0.0, 1.0, el2)
        else:
            dxs = px[s:e, None] - x1[None, :]
            exs = ex[None, :]
            el2 = elen2[None, :]
        t = np.clip((dxs * exs + dys * ey[None, :]) / el2, 0.0, 1.0)
        qx = dxs - t * exs
        qy = dys - t * ey[None, :]
        d = np.sqrt((qx * qx + qy * qy).min(axis=1))
        out[s:e] = d * METERS_PER_DEG if metric else d
    inside = points_in_polygon(px, py, xs, ys, ring_offsets)
    out[inside] = 0.0
    return out


def dist_to_polygon(px, py, xs, ys, ring_offsets, chunk: int = 2048) -> np.ndarray:
    """Min distance from each point to the polygon boundary (planar units).

    Points inside the polygon get distance 0 (membership semantics of
    ``sjoin_nearest``: distance to geometry is 0 when contained).
    """
    return _dist_kernel(px, py, xs, ys, ring_offsets, chunk, metric=False)


# metres per degree of latitude (equirectangular local approximation); the
# longitude step scales by cos(latitude). Shared with the DuckDB oracle
# formula in __spark_entry__ so both sides use the identical constant.
METERS_PER_DEG = 111320.0


def dist_to_polygon_m(px, py, xs, ys, ring_offsets, chunk: int = 2048) -> np.ndarray:
    """Min distance in METRES from WGS84 points to a WGS84 polygon boundary.

    Local equirectangular scaling per point (see _dist_kernel). This is the
    metre-unit parity path for the reference's
    ``sjoin_nearest(..., max_distance)`` whose distances are in the regions'
    CRS units — metres for every BNG-sourced dataset
    (/root/reference/geocode/utilities.py:253-284). Exact to the local-
    flat-earth approximation (<0.1% at region scale), vs the ~0.04% scale
    distortion BNG itself carries.

    Points inside the polygon get distance 0 (containment semantics).
    """
    return _dist_kernel(px, py, xs, ys, ring_offsets, chunk, metric=True)


def _seg_rect_intersect(x1, y1, x2, y2, rx0, ry0, rx1, ry1):
    """Bool matrix (rects x edges): does the segment intersect the rect?

    Separating-axis style: reject if the segment bbox misses the rect, then
    check whether both rect corners pairs lie strictly on the same side of
    the segment line (no intersection) — standard Cohen-Sutherland-ish test.
    """
    # segment bbox vs rect bbox overlap
    sxmin = np.minimum(x1, x2)[None, :]
    sxmax = np.maximum(x1, x2)[None, :]
    symin = np.minimum(y1, y2)[None, :]
    symax = np.maximum(y1, y2)[None, :]
    bbox_ok = (
        (sxmin <= rx1[:, None]) & (sxmax >= rx0[:, None])
        & (symin <= ry1[:, None]) & (symax >= ry0[:, None])
    )
    # line side test: f(px,py) = (x2-x1)(py-y1) - (y2-y1)(px-x1)
    ex = (x2 - x1)[None, :]
    ey = (y2 - y1)[None, :]
    def side(px, py):
        return ex * (py - y1[None, :]) - ey * (px - x1[None, :])
    s1 = side(rx0[:, None], ry0[:, None])
    s2 = side(rx1[:, None], ry0[:, None])
    s3 = side(rx1[:, None], ry1[:, None])
    s4 = side(rx0[:, None], ry1[:, None])
    all_pos = (s1 > 0) & (s2 > 0) & (s3 > 0) & (s4 > 0)
    all_neg = (s1 < 0) & (s2 < 0) & (s3 < 0) & (s4 < 0)
    return bbox_ok & ~(all_pos | all_neg)


def segments_intersect_rect(xs, ys, ring_offsets, rx0, ry0, rx1, ry1,
                            chunk: int = 1024) -> np.ndarray:
    """For each rect (arrays rx0..ry1): does ANY polygon edge intersect it?"""
    x1, y1, x2, y2 = _ring_edges(np.asarray(xs, float), np.asarray(ys, float),
                                 np.asarray(ring_offsets, int))
    nrect = np.asarray(rx0).shape[0]
    out = np.zeros(nrect, dtype=bool)
    if x1.size == 0:
        return out
    rx0 = np.asarray(rx0, float)
    ry0 = np.asarray(ry0, float)
    rx1 = np.asarray(rx1, float)
    ry1 = np.asarray(ry1, float)
    for s in range(0, nrect, chunk):
        e = min(s + chunk, nrect)
        m = _seg_rect_intersect(x1, y1, x2, y2, rx0[s:e], ry0[s:e], rx1[s:e], ry1[s:e])
        out[s:e] = m.any(axis=1)
    return out


def polygon_bbox(xs, ys):
    xs = np.asarray(xs, float)
    ys = np.asarray(ys, float)
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())
