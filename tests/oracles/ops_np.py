"""Eager NumPy oracle implementations of the L2 ops (SURVEY.md §4).

Written directly from the paper/canonical semantics as obviously-correct
loopy code; the jit/Pallas kernels are property-tested against these on
random clouds and edge cases. Keep each oracle short and independent of
the framework code.
"""

from __future__ import annotations

import numpy as np


# --- O1 voxelize ---------------------------------------------------------

def voxelize_np(points, mask, pc_range, voxel_size, grid_size,
                max_voxels, max_points_per_voxel):
    """Deterministic oracle matching the documented convention:
    voxels ordered by ascending linear cell id (z-major), points within
    a voxel in original index order, overflow dropped."""
    nx, ny, nz = grid_size
    cells = {}
    point_voxel = np.full(len(points), -1, np.int32)
    per_point_cell = np.full(len(points), -1, np.int64)
    for i, p in enumerate(points):
        if not mask[i]:
            continue
        ix = int(np.floor((p[0] - pc_range[0]) / voxel_size[0]))
        iy = int(np.floor((p[1] - pc_range[1]) / voxel_size[1]))
        iz = int(np.floor((p[2] - pc_range[2]) / voxel_size[2]))
        if not (0 <= ix < nx and 0 <= iy < ny and 0 <= iz < nz):
            continue
        cid = (iz * ny + iy) * nx + ix
        cells.setdefault(cid, []).append(i)
        per_point_cell[i] = cid

    cids = sorted(cells)[:max_voxels]
    p_dim = points.shape[1]
    voxels = np.zeros((max_voxels, max_points_per_voxel, p_dim), points.dtype)
    coords = np.full((max_voxels, 3), -1, np.int32)
    num_points = np.zeros(max_voxels, np.int32)
    for v, cid in enumerate(cids):
        kept = cells[cid][:max_points_per_voxel]
        for j, pi in enumerate(kept):
            voxels[v, j] = points[pi]
            point_voxel[pi] = v
        num_points[v] = len(kept)
        coords[v] = (cid // (nx * ny), (cid // nx) % ny, cid % nx)
    return voxels, coords, num_points, len(cids), point_voxel


# --- O2 FPS --------------------------------------------------------------

def fps_np(points, mask, m):
    n = len(points)
    valid = np.where(mask)[0]
    sel = np.zeros(m, np.int32)
    if len(valid) == 0:
        return sel
    sel[0] = valid[0]
    dist = np.full(n, np.inf)
    dist[~mask.astype(bool)] = -np.inf
    for i in range(1, m):
        d = np.sum((points - points[sel[i - 1]]) ** 2, axis=-1)
        d[~mask.astype(bool)] = -np.inf
        dist = np.minimum(dist, d)
        sel[i] = int(np.argmax(dist))
    return sel


# --- O3 ball query -------------------------------------------------------

def ball_query_np(centers, points, mask, radius, k):
    m = len(centers)
    out = np.zeros((m, k), np.int32)
    for i, c in enumerate(centers):
        d2 = np.sum((points - c) ** 2, axis=-1)
        inside = np.where((d2 < radius * radius) & mask.astype(bool))[0]
        if len(inside) == 0:
            continue
        sel = inside[:k]
        out[i, :len(sel)] = sel
        out[i, len(sel):] = sel[0]
    return out


# --- O5 three_nn ---------------------------------------------------------

def three_nn_np(query, source, smask):
    d2 = np.sum((query[:, None] - source[None, :]) ** 2, axis=-1)
    d2[:, ~smask.astype(bool)] = np.finfo(d2.dtype).max
    idx = np.argsort(d2, axis=1, kind="stable")[:, :3]
    return np.take_along_axis(d2, idx, axis=1), idx.astype(np.int32)


def three_interpolate_np(features, idx, dist2):
    w = 1.0 / (dist2 + 1e-8)
    w = w / w.sum(-1, keepdims=True)
    return np.einsum("nkc,nk->nc", features[idx], w)


# --- O10 rotated IoU (independent polygon clip) --------------------------

def _corners_np(b):
    x, y, l, w, yaw = b[0], b[1], b[3], b[4], b[6]
    local = np.array([[l / 2, w / 2], [-l / 2, w / 2],
                      [-l / 2, -w / 2], [l / 2, -w / 2]])
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s], [s, c]])
    return local @ rot.T + np.array([x, y])


def _clip_np(poly, p1, p2):
    """Clip CCW polygon (list of 2-vectors) by left side of p1->p2."""
    def cross2(u, v):
        return u[0] * v[1] - u[1] * v[0]

    out = []
    n = len(poly)
    for i in range(n):
        a, b = poly[i], poly[(i + 1) % n]
        sa = cross2(p2 - p1, a - p1)
        sb = cross2(p2 - p1, b - p1)
        if sa >= -1e-8:
            out.append(a)
        if (sa >= -1e-8) != (sb >= -1e-8):
            t = sa / (sa - sb)
            out.append(a + t * (b - a))
    return out


def _area_np(poly):
    if len(poly) < 3:
        return 0.0
    s = 0.0
    for i in range(len(poly)):
        a, b = poly[i], poly[(i + 1) % len(poly)]
        s += a[0] * b[1] - a[1] * b[0]
    return abs(s) / 2.0


def rotated_iou_np(box_a, box_b):
    ca = [v for v in _corners_np(box_a)]
    cb = _corners_np(box_b)
    poly = ca
    for k in range(4):
        poly = _clip_np(poly, cb[k], cb[(k + 1) % 4])
        if not poly:
            break
    inter = _area_np(poly)
    ua = box_a[3] * box_a[4] + box_b[3] * box_b[4] - inter
    return inter / max(ua, 1e-8)


# --- O11 NMS -------------------------------------------------------------

def nms_np(boxes, scores, labels, iou_thr, score_thr):
    order = np.argsort(-scores, kind="stable")
    keep = []
    for i in order:
        if scores[i] <= score_thr:
            continue
        ok = True
        for j in keep:
            if labels[j] == labels[i] and \
                    rotated_iou_np(boxes[j], boxes[i]) > iou_thr:
                ok = False
                break
        if ok:
            keep.append(i)
    return keep


# --- O7/O8 sparse conv ---------------------------------------------------

def sparse_conv3d_np(coords_in, feats_in, num_in, weights, kernel_size,
                     stride, padding, grid_in):
    """Brute-force gather conv. Returns dict {out_coord: feature}."""
    kz, ky, kx = kernel_size
    table = {tuple(coords_in[i]): i for i in range(num_in)}
    go = tuple((g + 2 * p - k) // s + 1
               for g, k, s, p in zip(grid_in, kernel_size, stride, padding))
    out = {}
    for i in range(num_in):
        cz, cy, cx = coords_in[i]
        for oz_k in range(kz):
            for oy_k in range(ky):
                for ox_k in range(kx):
                    nz = cz + padding[0] - oz_k
                    ny = cy + padding[1] - oy_k
                    nx = cx + padding[2] - ox_k
                    if nz % stride[0] or ny % stride[1] or nx % stride[2]:
                        continue
                    oz, oy, ox = (nz // stride[0], ny // stride[1],
                                  nx // stride[2])
                    if not (0 <= oz < go[0] and 0 <= oy < go[1]
                            and 0 <= ox < go[2]):
                        continue
                    key = (oz, oy, ox)
                    k_flat = (oz_k * ky + oy_k) * kx + ox_k
                    contrib = feats_in[i] @ weights[k_flat]
                    out[key] = out.get(key, 0.0) + contrib
    return out


# --- O12 range projection ------------------------------------------------

def range_project_np(points, mask, h, w, fov_up_deg, fov_down_deg):
    n = len(points)
    fov_up = np.deg2rad(fov_up_deg)
    fov_down = np.deg2rad(fov_down_deg)
    fov = fov_up - fov_down
    image = np.zeros((h, w, 5), np.float32)
    zbuf = np.full((h, w), np.inf)
    widx = np.full((h, w), n, np.int64)
    uv = np.zeros((n, 2), np.int32)
    for i, p in enumerate(points):
        r = float(np.linalg.norm(p[:3]))
        yaw = np.arctan2(p[1], p[0])
        pitch = np.arcsin(np.clip(p[2] / max(r, 1e-6), -1, 1))
        u = int(np.clip(np.floor(0.5 * (1 - yaw / np.pi) * w), 0, w - 1))
        v = int(np.clip(np.floor((1 - (pitch - fov_down) / fov) * h),
                        0, h - 1))
        uv[i] = (v, u)
        if not mask[i]:
            continue
        if r < zbuf[v, u] or (r == zbuf[v, u] and i < widx[v, u]):
            zbuf[v, u] = r
            widx[v, u] = i
            rem = p[3] if len(p) > 3 else 0.0
            image[v, u] = (r, p[0], p[1], p[2], rem)
    return image, widx < n, uv
