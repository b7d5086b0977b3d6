"""2D→3D feature lifting: gather per-point pixel features.

Replaces the reference's per-sample Python loop with fancy indexing
(``mopa/models/xmuda_arch.py:62-65``) by one vectorised batched gather over a
padded (B, P, 2) index tensor — fully inside jit, no ragged lists.
"""

import jax
import jax.numpy as jnp


def lift_image_feats(feat_map: jax.Array, img_indices: jax.Array,
                     valid: jax.Array) -> jax.Array:
    """Gather features at per-point pixel coordinates.

    Args:
        feat_map: (B, H, W, C) image features.
        img_indices: (B, P, 2) int32 (row, col) pixel coordinates per point.
        valid: (B, P) bool padding mask.

    Returns:
        (B, P, C); padding points receive zeros.
    """
    rows = jnp.clip(img_indices[..., 0], 0, feat_map.shape[1] - 1)
    cols = jnp.clip(img_indices[..., 1], 0, feat_map.shape[2] - 1)

    def gather_one(fm, r, c):
        return fm[r, c]

    out = jax.vmap(gather_one)(feat_map, rows, cols)
    return jnp.where(valid[..., None], out, 0.0)
