"""Independent NumPy CPU reference rasterizer used as the golden oracle for
the JAX/Pallas rasterizer (SURVEY.md §4: golden-image test strategy).

Deliberately written triangle-by-triangle (not tiled/binned/chunked) so it
shares no control-flow structure with the implementation under test, while
using the same mathematical conventions (nvdiffrast contract):
pixel centers at (ix+0.5, iy+0.5), NDC -> pixels via (ndc+1)*size/2,
coverage = all edge functions >= 0 after orientation normalization,
z = screen-affine interpolated z/w, closest-z-first-triangle wins,
(u, v) = perspective-correct barycentrics of vertices 1 and 2.
"""

import numpy as np


def _clip_near_poly(v, eps=1e-6):
    """Sutherland-Hodgman clip of one triangle (3, 4) float64 clip coords
    against the plane w >= eps. Returns (poly_verts (n, 4), poly_bary
    (n, 3)) with n in {0, 3, 4}; poly_bary carries each output vertex's
    barycentric coordinates w.r.t. the ORIGINAL triangle so attributes /
    (u, v) interpolate against the original vertices (nvdiffrast
    semantics)."""
    base_bary = np.eye(3, dtype=np.float64)
    out_v, out_b = [], []
    for i in range(3):
        a, b = v[i], v[(i + 1) % 3]
        ba, bb = base_bary[i], base_bary[(i + 1) % 3]
        ina, inb = a[3] >= eps, b[3] >= eps
        if ina:
            out_v.append(a)
            out_b.append(ba)
        if ina != inb:
            t = (eps - a[3]) / (b[3] - a[3])
            out_v.append(a + t * (b - a))
            out_b.append(ba + t * (bb - ba))
    return np.asarray(out_v, np.float64), np.asarray(out_b, np.float64)


def rasterize_np(pos, tri, resolution):
    """pos (B, V, 4) f32, tri (T, 3) int, resolution (H, W).
    Returns (B, H, W, 4) float32: (u, v, z/w, tri_id + 1)."""
    height, width = resolution
    pos = np.asarray(pos, np.float32)
    tri = np.asarray(tri, np.int64)
    batch = pos.shape[0]
    out = np.zeros((batch, height, width, 4), np.float32)

    for b in range(batch):
        zbuf = np.full((height, width), np.inf, np.float32)
        idbuf = np.zeros((height, width), np.int32)
        ubuf = np.zeros((height, width), np.float32)
        vbuf = np.zeros((height, width), np.float32)

        def raster_tri(vsub, bary, t, f32):
            """Rasterize one screen triangle (vsub (3, 4) clip coords, all
            w > 0) into the buffers. ``bary`` (3, 3): each sub-vertex's
            barycentric coords w.r.t. the original triangle t (identity for
            unclipped); (u, v) output = perspective-correct interpolation of
            bary columns 1 and 2. ``f32`` mirrors the fp32 rounding of the
            unclipped reference path; clipped sub-triangles run in float64
            (their w->eps vertices project to huge screen coords)."""
            ftype = np.float32 if f32 else np.float64
            inv_w = ftype(1.0) / vsub[:, 3].astype(ftype)
            xs = (vsub[:, 0].astype(ftype) * inv_w + 1) * ftype(width * 0.5)
            ys = (vsub[:, 1].astype(ftype) * inv_w + 1) * ftype(height * 0.5)
            zw = vsub[:, 2].astype(ftype) * inv_w
            area = ftype(
                (xs[1] - xs[0]) * (ys[2] - ys[0])
                - (ys[1] - ys[0]) * (xs[2] - xs[0])
            )
            if area == 0:
                return
            sgn = ftype(-1.0 if area < 0 else 1.0)
            inv_area = ftype(1.0 / abs(area))

            x0 = max(int(np.floor(xs.min() - 0.5)), 0)
            x1 = min(int(np.ceil(xs.max() + 0.5)), width - 1)
            y0 = max(int(np.floor(ys.min() - 0.5)), 0)
            y1 = min(int(np.ceil(ys.max() + 0.5)), height - 1)
            if x1 < x0 or y1 < y0:
                return

            px = (np.arange(x0, x1 + 1, dtype=ftype) + ftype(0.5))[None, :]
            py = (np.arange(y0, y1 + 1, dtype=ftype) + ftype(0.5))[:, None]

            e = []
            for i in range(3):
                a = (i + 1) % 3
                c = (i + 2) % 3
                dx = ftype(xs[c] - xs[a]) * sgn
                dy = ftype(ys[c] - ys[a]) * sgn
                e.append(dx * (py - ys[a]) - dy * (px - xs[a]))
            cov = (e[0] >= 0) & (e[1] >= 0) & (e[2] >= 0)
            if not cov.any():
                return

            zc = zw * inv_area
            z = e[0] * zc[0] + e[1] * zc[1] + e[2] * zc[2]
            cov &= (z >= -1.0) & (z <= 1.0)

            sub = np.s_[y0 : y1 + 1, x0 : x1 + 1]
            zf = z.astype(np.float32)
            upd = cov & (zf < zbuf[sub])
            if not upd.any():
                return

            pw = [e[i] * inv_area * inv_w[i] for i in range(3)]
            denom = pw[0] + pw[1] + pw[2]
            denom = np.where(np.abs(denom) < 1e-20, 1e-20, denom)
            bary = bary.astype(ftype)
            uu = (
                pw[0] * bary[0, 1] + pw[1] * bary[1, 1] + pw[2] * bary[2, 1]
            ) / denom
            vv = (
                pw[0] * bary[0, 2] + pw[1] * bary[1, 2] + pw[2] * bary[2, 2]
            ) / denom

            zbuf[sub] = np.where(upd, zf, zbuf[sub])
            idbuf[sub] = np.where(upd, t + 1, idbuf[sub])
            ubuf[sub] = np.where(upd, uu.astype(np.float32), ubuf[sub])
            vbuf[sub] = np.where(upd, vv.astype(np.float32), vbuf[sub])

        v = pos[b][tri]  # (T, 3, 4)
        w = v[..., 3]
        front = np.all(w > 1e-8, axis=-1)
        any_front = np.any(w > 1e-8, axis=-1)
        eye3 = np.eye(3, dtype=np.float64)

        for t in range(tri.shape[0]):
            if front[t]:
                raster_tri(v[t], eye3, t, f32=True)
            elif any_front[t]:
                # Near-plane clip (float64): fan-triangulate the clipped
                # polygon, carrying original-triangle barycentrics.
                pv, pb = _clip_near_poly(v[t].astype(np.float64))
                for k in range(1, len(pv) - 1):
                    raster_tri(
                        pv[[0, k, k + 1]], pb[[0, k, k + 1]], t, f32=False
                    )

        mask = idbuf > 0
        out[b, ..., 0] = np.where(mask, ubuf, 0.0)
        out[b, ..., 1] = np.where(mask, vbuf, 0.0)
        out[b, ..., 2] = np.where(mask, zbuf, 0.0)
        out[b, ..., 3] = idbuf.astype(np.float32)
    return out
