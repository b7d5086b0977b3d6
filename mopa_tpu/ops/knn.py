"""Range-image KNN label post-processing (SalsaNext-style).

JAX re-implementation of the reference ``KNN`` module
(``mopa/models/knn.py:37-196``): for each 3D point, gather the 5x5 range-image
neighbourhood of its pixel, weight |range difference| by an inverse-gaussian
spatial kernel, take the k nearest by weighted range distance, cut off beyond
``cutoff`` and majority-vote their labels. Used at eval when ``VAL.use_knn``.

The reference's ``knn_prob`` variant carries an author-flagged bug (knn.py:162
"TODO: Bug found here"); here the probability variant implements the intended
behaviour: per-point sum of the k nearest neighbours' class probabilities with
cutoff-invalid neighbours zeroed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_2d(size: int, sigma: float) -> np.ndarray:
    """Normalised 2D gaussian (matches reference get_gaussian_kernel)."""
    ax = np.arange(size) - size // 2
    g = np.exp(-0.5 * (ax / sigma) ** 2)
    k = np.outer(g, g)
    return k / k.sum()


@functools.partial(jax.jit, static_argnames=("nclasses", "search", "k",
                                             "sigma", "output_prob"))
def knn_postprocess(proj_range, unproj_range, proj_values, px, py, valid,
                    *, nclasses: int, search: int = 5, k: int = 5,
                    sigma: float = 1.0, cutoff: float = 1.0,
                    output_prob: bool = False):
    """
    Args:
        proj_range: (H, W) range image (<0 = empty pixel).
        unproj_range: (P,) per-point true range.
        proj_values: (H, W) int label image, or (H, W, C) prob image when
            ``output_prob``.
        px, py: (P,) pixel coords per point.
        valid: (P,) point mask.

    Returns: (P,) voted labels, or (P, C) summed probabilities.
    """
    h, w = proj_range.shape
    pad = (search - 1) // 2
    offs = [(dy, dx) for dy in range(-pad, pad + 1) for dx in range(-pad, pad + 1)]
    center = (search * search - 1) // 2

    py = jnp.clip(py, 0, h - 1)
    px = jnp.clip(px, 0, w - 1)

    # gather the search x search neighbourhood ranges per point
    def nb_range(dy, dx):
        yy = jnp.clip(py + dy, 0, h - 1)
        xx = jnp.clip(px + dx, 0, w - 1)
        inb = ((py + dy >= 0) & (py + dy < h) & (px + dx >= 0) & (px + dx < w))
        r = proj_range[yy, xx]
        r = jnp.where((r < 0) | ~inb, jnp.inf, r)
        return r, yy, xx, inb

    ranges = []
    coords = []
    for dy, dx in offs:
        r, yy, xx, inb = nb_range(dy, dx)
        ranges.append(r)
        coords.append((yy, xx, inb))
    ranges = jnp.stack(ranges, axis=0)  # (S2, P)
    ranges = ranges.at[center].set(unproj_range)

    dist = jnp.abs(ranges - unproj_range[None, :])
    inv_gauss = (1.0 - gaussian_kernel_2d(search, sigma).reshape(-1))
    dist = dist * jnp.asarray(inv_gauss, dist.dtype)[:, None]

    # k smallest weighted distances
    neg_top, idx = jax.lax.top_k(-dist.T, k)  # (P, k)
    knn_dist = -neg_top

    if not output_prob:
        labels = []
        for (yy, xx, inb) in coords:
            labels.append(proj_values[yy, xx])
        labels = jnp.stack(labels, axis=0)  # (S2, P)
        knn_lab = jnp.take_along_axis(labels.T, idx, axis=1)  # (P, k)
        knn_lab = jnp.where(knn_dist > cutoff, nclasses, knn_lab)
        onehot = jax.nn.one_hot(knn_lab, nclasses + 1, dtype=jnp.int32).sum(1)
        out = jnp.argmax(onehot[:, :nclasses], axis=-1)
        return jnp.where(valid, out, 0)

    probs = []
    for (yy, xx, inb) in coords:
        probs.append(proj_values[yy, xx])
    probs = jnp.stack(probs, axis=0)  # (S2, P, C)
    knn_p = jnp.take_along_axis(probs.transpose(1, 0, 2),
                                idx[:, :, None], axis=1)  # (P, k, C)
    knn_p = jnp.where((knn_dist > cutoff)[:, :, None], 0.0, knn_p)
    out = knn_p.sum(axis=1)
    return jnp.where(valid[:, None], out, 0.0)


def knn_postprocess_scan(points, valid, values, *, nclasses: int,
                         fov_up: float, fov_down: float, proj_w: int,
                         proj_h: int, k: int = 5, search: int = 5,
                         sigma: float = 1.0, cutoff: float = 1.0,
                         output_prob: bool = False):
    """Range-image KNN post-processing of one scan's per-point predictions.

    Eval-time path of the reference's ``post_knn`` consumption
    (``mopa/data/utils/validate.py:46-50,98-109``): rasterise the scan into a
    range image carrying ``values`` (int labels, or (P, C) probabilities when
    ``output_prob``), then re-predict every point from its k nearest
    range-image neighbours.

    Args:
        points: (P, >=3) metric sensor-frame points.
        valid: (P,) bool.
        values: (P,) int predictions or (P, C) probabilities.

    Returns: (P,) voted labels, or (P, C) neighbour-summed probabilities.
    """
    img_range, img_vals, px, py, depth = build_range_image(
        points[:, :3], fov_up, fov_down, proj_w, proj_h, values, valid)
    return knn_postprocess(img_range, depth, img_vals, px, py, valid,
                           nclasses=nclasses, search=search, k=k, sigma=sigma,
                           cutoff=cutoff, output_prob=output_prob)


def build_range_image(points, fov_up, fov_down, proj_w, proj_h, values,
                      valid):
    """Rasterise per-point values and ranges into a range image, keeping the
    nearest point per pixel (host-free; used before knn_postprocess)."""
    from mopa_tpu.ops.projection import project_pixels

    pix, depth = project_pixels(points[:, :3], fov_up, fov_down, proj_w, proj_h)
    big = jnp.float32(1e30)
    d = jnp.where(valid, depth, big)
    dmin = jnp.full((proj_h * proj_w,), big).at[pix].min(d)
    winner = valid & (d <= dmin[pix])
    img_range = jnp.where(dmin < big, dmin, -1.0).reshape(proj_h, proj_w)
    if values.ndim == 1:
        vals = jnp.zeros((proj_h * proj_w,), values.dtype).at[
            jnp.where(winner, pix, proj_h * proj_w - 1)].max(
            jnp.where(winner, values, 0))
        img_vals = vals.reshape(proj_h, proj_w)
    else:
        vals = jnp.zeros((proj_h * proj_w, values.shape[-1]), values.dtype)
        vals = vals.at[jnp.where(winner, pix, 0)].add(
            jnp.where(winner[:, None], values, 0.0))
        img_vals = vals.reshape(proj_h, proj_w, -1)
    px = pix % proj_w
    py = pix // proj_w
    return img_range, img_vals, px, py, depth
