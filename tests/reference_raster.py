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

        v = pos[b][tri]  # (T, 3, 4)
        w = v[..., 3]
        valid = np.all(w > 1e-8, axis=-1)
        w_safe = np.where(np.abs(w) < 1e-8, 1e-8, w)
        inv_w = (1.0 / w_safe).astype(np.float32)
        x = ((v[..., 0] * inv_w + 1.0) * (width * 0.5)).astype(np.float32)
        y = ((v[..., 1] * inv_w + 1.0) * (height * 0.5)).astype(np.float32)
        zw = (v[..., 2] * inv_w).astype(np.float32)

        for t in range(tri.shape[0]):
            if not valid[t]:
                continue
            xs, ys = x[t], y[t]
            area = np.float32(
                (xs[1] - xs[0]) * (ys[2] - ys[0]) - (ys[1] - ys[0]) * (xs[2] - xs[0])
            )
            if area == 0:
                continue
            sgn = np.float32(-1.0 if area < 0 else 1.0)
            inv_area = np.float32(1.0 / abs(area))

            x0 = max(int(np.floor(xs.min() - 0.5)), 0)
            x1 = min(int(np.ceil(xs.max() + 0.5)), width - 1)
            y0 = max(int(np.floor(ys.min() - 0.5)), 0)
            y1 = min(int(np.ceil(ys.max() + 0.5)), height - 1)
            if x1 < x0 or y1 < y0:
                continue

            px = (np.arange(x0, x1 + 1, dtype=np.float32) + 0.5)[None, :]
            py = (np.arange(y0, y1 + 1, dtype=np.float32) + 0.5)[:, None]

            e = []
            for i in range(3):
                a = (i + 1) % 3
                c = (i + 2) % 3
                dx = np.float32(xs[c] - xs[a]) * sgn
                dy = np.float32(ys[c] - ys[a]) * sgn
                e.append(dx * (py - ys[a]) - dy * (px - xs[a]))
            cov = (e[0] >= 0) & (e[1] >= 0) & (e[2] >= 0)
            if not cov.any():
                continue

            zc = zw[t] * inv_area
            z = e[0] * zc[0] + e[1] * zc[1] + e[2] * zc[2]
            cov &= (z >= -1.0) & (z <= 1.0)

            sub_z = zbuf[y0 : y1 + 1, x0 : x1 + 1]
            upd = cov & (z < sub_z)
            if not upd.any():
                continue

            b0 = e[0] * inv_area
            b1 = e[1] * inv_area
            b2 = e[2] * inv_area
            pw0 = b0 * inv_w[t, 0]
            pw1 = b1 * inv_w[t, 1]
            pw2 = b2 * inv_w[t, 2]
            denom = pw0 + pw1 + pw2
            denom = np.where(np.abs(denom) < 1e-20, 1e-20, denom)
            uu = pw1 / denom
            vv = pw2 / denom

            sub = np.s_[y0 : y1 + 1, x0 : x1 + 1]
            zbuf[sub] = np.where(upd, z, zbuf[sub])
            idbuf[sub] = np.where(upd, t + 1, idbuf[sub])
            ubuf[sub] = np.where(upd, uu, ubuf[sub])
            vbuf[sub] = np.where(upd, vv, vbuf[sub])

        mask = idbuf > 0
        out[b, ..., 0] = np.where(mask, ubuf, 0.0)
        out[b, ..., 1] = np.where(mask, vbuf, 0.0)
        out[b, ..., 2] = np.where(mask, zbuf, 0.0)
        out[b, ..., 3] = idbuf.astype(np.float32)
    return out
