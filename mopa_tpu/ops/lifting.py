"""2D→3D feature lifting: gather per-point pixel features.

Replaces the reference's per-sample Python loop with fancy indexing
(``mopa/models/xmuda_arch.py:62-65``) by one vectorised batched gather over a
padded (B, P, 2) index tensor — fully inside jit, no ragged lists.

The BACKWARD is a custom VJP: XLA's scatter-add of (B*P) feature rows into
the dense map is per-row rate-bound (~5.5 M rows/s on v5e — measured ~48 ms
per step, sorted-indices flags included). Instead the cotangent rows are
sorted by target pixel, per-pixel sums come from a cumsum difference at
segment boundaries, and the dense map is filled by ONE gather (gathers run
~50x faster than scatters per row); the only scatter left is a cheap 1-D
int32 slot map.
"""

import jax
import jax.numpy as jnp


def _lift_gather(feat_map, img_indices, valid):
    rows = jnp.clip(img_indices[..., 0], 0, feat_map.shape[1] - 1)
    cols = jnp.clip(img_indices[..., 1], 0, feat_map.shape[2] - 1)

    def gather_one(fm, r, c):
        return fm[r, c]

    out = jax.vmap(gather_one)(feat_map, rows, cols)
    return jnp.where(valid[..., None], out, 0.0)


@jax.custom_vjp
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
    return _lift_gather(feat_map, img_indices, valid)


def _lift_fwd(feat_map, img_indices, valid):
    out = _lift_gather(feat_map, img_indices, valid)
    # zero-size token carries shape/dtype without retaining the features
    token = jnp.zeros((0,) + feat_map.shape, feat_map.dtype)
    return out, (token, img_indices, valid)


def _lift_bwd(res, g):
    token, img_indices, valid = res
    dtype = token.dtype
    b, h, w, c = token.shape[1:]
    p = img_indices.shape[1]
    n = b * p
    hw = h * w

    rows = jnp.clip(img_indices[..., 0], 0, h - 1)
    cols = jnp.clip(img_indices[..., 1], 0, w - 1)
    gpix = (jnp.arange(b, dtype=jnp.int32)[:, None] * hw
            + rows * w + cols).reshape(-1)
    gflat = jnp.where(valid[..., None], g, 0.0).reshape(n, c)

    perm = jnp.arange(n, dtype=jnp.int32)
    sp, s_perm = jax.lax.sort((gpix, perm), num_keys=1)
    gs = gflat[s_perm].astype(jnp.float32)
    cs = jnp.cumsum(gs, axis=0)

    pos = jnp.arange(n, dtype=jnp.int32)
    head = jnp.concatenate([jnp.ones((1,), bool), sp[1:] != sp[:-1]])
    head_pos = jax.lax.cummax(jnp.where(head, pos, -1))
    safe_prev = jnp.clip(head_pos - 1, 0, n - 1)
    base = jnp.where((head_pos > 0)[:, None], cs[safe_prev], 0.0)
    seg_sum = cs - base                      # full sum at each segment's tail
    is_last = jnp.concatenate([head[1:], jnp.ones((1,), bool)])

    # 1-D slot map: global pixel -> sorted position of its segment tail
    tgt = jnp.where(is_last, sp, hw * b)
    slot = jnp.full((hw * b + 1,), -1, jnp.int32).at[tgt].set(pos)[:-1]
    dmap = jnp.where((slot >= 0)[:, None],
                     seg_sum[jnp.clip(slot, 0, n - 1)], 0.0)
    return dmap.reshape(b, h, w, c).astype(dtype), None, None


lift_image_feats.defvjp(_lift_fwd, _lift_bwd)
