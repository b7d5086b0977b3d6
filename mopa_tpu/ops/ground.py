"""Ground-plane segmentation as a batched JAX op (Patchwork++-style).

TPU-native replacement for the pypatchworkpp C++ dependency used by the
reference for ground-index extraction — offline in the preprocess pipelines
(``mopa/data/semantic_kitti/preprocess.py:199-224``,
``mopa/data/nuscenes/preprocess.py:161-221``) and online as a fallback inside
VGI's ``obj_on_road`` (``mopa/data/mixmatch_ss.py:381-388``).

Algorithm (fixed shapes, jit/vmap-compatible — a concentric-zone model like
Patchwork++ with static bin counts):

1. **RNR** (reflected-noise removal, Patchwork++ §III-B): points below a
   z-floor under the sensor's ground level are virtual reflections (mirror
   images under wet/glass surfaces) — they are excluded from seeding, from
   plane fits and from the final ground mask. Without per-point intensity
   (the reference pipelines feed xyz only) the floor is purely geometric.
2. partition points into R log-spaced rings x S azimuth sectors;
3. per bin, seed with the lowest-z points (z < bin_min_z + seed_margin);
4. fit a plane by PCA (3x3 covariance eigendecomposition) on the seeds;
5. refine: G rounds of inlier-select (|signed plane distance| < dist_thresh)
   and refit — Patchwork's R-GPF;
6. accept bins via a GLE-style gate: upright normal (|n_z| > uprightness),
   small surface variance (flatness), and — for the inner rings, where the
   sensor-relative ground level is well defined — plane **elevation** within
   a margin of the expected ground height (Patchwork++'s adaptive GLE keeps
   per-zone elevation statistics across frames; this stateless op uses the
   sensor height prior instead), then mark plane inliers as ground.

Patchwork++'s TGR (temporal ground revert) needs cross-frame state and has no
stateless equivalent; scans here are processed independently, exactly like
the reference's per-scan ``estimateGround`` calls.

Fixture-level fidelity (flat road / ramp / curb / reflected noise) is pinned
by ``tests/test_ground_fixtures.py``.
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
                    sensor_height: float = 1.73, rnr_floor_margin: float = 0.8,
                    elev_margin: float = 0.7):
    """Per-point ground mask for one scan.

    Args:
        points: (N, 3+) xyz[...]; valid: (N,) mask.
        rnr_floor_margin: points with z < -(sensor_height + margin) are
            treated as reflected noise (RNR) — never ground, never seeds.
        elev_margin: inner-ring bins whose fitted plane sits higher than
            ``-sensor_height + elev_margin`` are rejected (GLE elevation gate
            against roofs/decks being labelled ground).

    Returns:
        (N,) bool ground mask.
    """
    xyz = points[:, :3]
    nb = num_rings * num_sectors

    r = jnp.sqrt(xyz[:, 0] ** 2 + xyz[:, 1] ** 2)
    theta = jnp.arctan2(xyz[:, 1], xyz[:, 0])  # [-pi, pi]
    log_r = jnp.log(jnp.clip(r, r_min, r_max) / r_min)
    ring = jnp.clip((log_r / np.log(r_max / r_min) * num_rings).astype(jnp.int32),
                    0, num_rings - 1)
    sector = jnp.clip(((theta + np.pi) / (2 * np.pi) * num_sectors).astype(jnp.int32),
                      0, num_sectors - 1)
    bin_id = ring * num_sectors + sector
    # RNR: reflections mirror under the true ground — below the floor means
    # physically impossible returns for a ground-mounted sensor
    noise = xyz[:, 2] < -(sensor_height + rnr_floor_margin)
    ok = valid & (r >= r_min * 0.5) & (r <= r_max) & ~noise
    sid = jnp.where(ok, bin_id, nb)  # dump slot

    big = jnp.float32(1e30)
    zmin = jnp.full((nb + 1,), big).at[sid].min(jnp.where(ok, xyz[:, 2], big))[:nb]

    def fit(weights):
        """Weighted plane fit per bin -> (normal, d, msd, wsum, mean_z)."""
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
        return normal, d, msd, wsum, mean[:, 2]

    # seeds: lowest points per bin; the absolute z-ceiling only binds the
    # inner rings (near the sensor the ground level is pinned by its mount
    # height; far rings may climb hills/ramps well above it)
    inner_pt = ring < (num_rings // 2)
    seed_w = (ok & (xyz[:, 2] < zmin[jnp.clip(bin_id, 0, nb - 1)] + seed_margin)
              & (~inner_pt | (xyz[:, 2] < -sensor_height + 1.5))
              ).astype(jnp.float32)
    carry0 = fit(seed_w)

    def body(_, carry):
        normal, d, msd, wsum, mean_z = carry
        dist = jnp.abs(jnp.sum(xyz * normal[jnp.clip(bin_id, 0, nb - 1)], axis=1)
                       + d[jnp.clip(bin_id, 0, nb - 1)])
        w = (ok & (dist < dist_thresh)).astype(jnp.float32)
        return fit(w)

    normal, d, msd, wsum, mean_z = jax.lax.fori_loop(0, num_iter, body, carry0)

    # GLE acceptance: upright + flat (+ elevation gate on the inner rings,
    # where sensor height pins the expected ground level; outer rings may
    # legitimately climb hills, so only uprightness/flatness apply there)
    bin_ring = jnp.arange(nb) // num_sectors
    inner = bin_ring < (num_rings // 2)
    elev_ok = ~inner | (mean_z < (-sensor_height + elev_margin))
    bin_ground = ((jnp.abs(normal[:, 2]) > uprightness)
                  & (msd < max_surface_var) & (wsum >= 3) & elev_ok)
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
