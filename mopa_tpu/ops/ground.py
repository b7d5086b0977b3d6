"""Ground-plane segmentation as a batched JAX op (Patchwork++-style).

TPU-native replacement for the pypatchworkpp C++ dependency used by the
reference for ground-index extraction — offline in the preprocess pipelines
(``mopa/data/semantic_kitti/preprocess.py:199-224``,
``mopa/data/nuscenes/preprocess.py:161-221``) and online as a fallback inside
VGI's ``obj_on_road`` (``mopa/data/mixmatch_ss.py:381-388``).

Algorithm (fixed shapes, jit/vmap-compatible — a concentric-zone model like
Patchwork++ with static bin counts):

1. partition points into R log-spaced rings x S azimuth sectors;
2. per bin, seed with the lowest-z points (z < bin_min_z + seed_margin);
3. fit a plane by PCA (3x3 covariance eigendecomposition) on the seeds;
4. refine: G rounds of inlier-select (|signed plane distance| < dist_thresh)
   and refit — Patchwork's R-GPF;
5. accept bins whose plane is upright (|n_z| > uprightness_thresh) and whose
   surface variance is small (flatness), then mark inliers as ground.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("num_rings", "num_sectors",
                                             "num_iter"))
def estimate_ground(points, valid, *, num_rings: int = 16,
                    num_sectors: int = 32, num_iter: int = 3,
                    r_min: float = 1.0, r_max: float = 80.0,
                    seed_margin: float = 0.3, dist_thresh: float = 0.175,
                    uprightness: float = 0.707, max_surface_var: float = 0.02,
                    sensor_height: float = 1.73):
    """Per-point ground mask for one scan.

    Args:
        points: (N, 3+) xyz[...]; valid: (N,) mask.

    Returns:
        (N,) bool ground mask.
    """
    xyz = points[:, :3]
    n = xyz.shape[0]
    nb = num_rings * num_sectors

    r = jnp.sqrt(xyz[:, 0] ** 2 + xyz[:, 1] ** 2)
    theta = jnp.arctan2(xyz[:, 1], xyz[:, 0])  # [-pi, pi]
    log_r = jnp.log(jnp.clip(r, r_min, r_max) / r_min)
    ring = jnp.clip((log_r / np.log(r_max / r_min) * num_rings).astype(jnp.int32),
                    0, num_rings - 1)
    sector = jnp.clip(((theta + np.pi) / (2 * np.pi) * num_sectors).astype(jnp.int32),
                      0, num_sectors - 1)
    bin_id = ring * num_sectors + sector
    ok = valid & (r >= r_min * 0.5) & (r <= r_max)
    sid = jnp.where(ok, bin_id, nb)  # dump slot

    big = jnp.float32(1e30)
    zmin = jnp.full((nb + 1,), big).at[sid].min(jnp.where(ok, xyz[:, 2], big))[:nb]

    def fit(weights):
        """Weighted plane fit per bin -> (normal (nb,3), d (nb,), msd (nb,))."""
        wsum = jnp.zeros((nb + 1,)).at[sid].add(weights)[:nb]
        wsum_c = jnp.maximum(wsum, 1e-6)
        mean = jnp.zeros((nb + 1, 3)).at[sid].add(weights[:, None] * xyz)[:nb] \
            / wsum_c[:, None]
        centered = xyz - mean[jnp.clip(bin_id, 0, nb - 1)]
        outer = centered[:, :, None] * centered[:, None, :]
        cov = jnp.zeros((nb + 1, 3, 3)).at[sid].add(
            weights[:, None, None] * outer)[:nb] / wsum_c[:, None, None]
        evals, evecs = jnp.linalg.eigh(cov)  # ascending
        normal = evecs[:, :, 0]
        normal = normal * jnp.sign(normal[:, 2:3] + 1e-12)  # point up
        d = -jnp.sum(normal * mean, axis=1)
        msd = evals[:, 0]  # mean squared dist to plane (smallest eigenvalue)
        return normal, d, msd, wsum

    # seeds: lowest points per bin
    seed_w = (ok & (xyz[:, 2] < zmin[jnp.clip(bin_id, 0, nb - 1)] + seed_margin)
              & (xyz[:, 2] < -sensor_height + 1.5)).astype(jnp.float32)
    normal, d, msd, wsum = fit(seed_w)

    def body(_, carry):
        normal, d, msd, wsum = carry
        dist = jnp.abs(jnp.sum(xyz * normal[jnp.clip(bin_id, 0, nb - 1)], axis=1)
                       + d[jnp.clip(bin_id, 0, nb - 1)])
        w = (ok & (dist < dist_thresh)).astype(jnp.float32)
        return fit(w)

    normal, d, msd, wsum = jax.lax.fori_loop(0, num_iter, body,
                                             (normal, d, msd, wsum))

    bin_ground = ((jnp.abs(normal[:, 2]) > uprightness)
                  & (msd < max_surface_var) & (wsum >= 3))
    dist = jnp.abs(jnp.sum(xyz * normal[jnp.clip(bin_id, 0, nb - 1)], axis=1)
                   + d[jnp.clip(bin_id, 0, nb - 1)])
    return ok & bin_ground[jnp.clip(bin_id, 0, nb - 1)] & (dist < dist_thresh)


def estimate_ground_np(points, **kwargs):
    """Host convenience wrapper returning int32 ground indices like
    pypatchworkpp's ``getGroundIndices()``."""
    pts = np.asarray(points, np.float32)
    mask = np.asarray(estimate_ground(jnp.asarray(pts[:, :3]),
                                      jnp.ones(pts.shape[0], bool), **kwargs))
    return np.nonzero(mask)[0].astype(np.int32)
