"""Segment-Anything in JAX: on-device mask generation for SAM consistency.

The reference generates SAM masks OFFLINE with the PyTorch segment-anything
package (``mopa/data/sam_refine.py:127-248``) and ships them as ``.bin`` id
maps. This module provides the TPU-native pipeline (BASELINE config 5): the
SAM architecture (ViT image encoder with windowed attention, point prompt
encoder, two-way-transformer mask decoder) in flax, plus a jittable
:class:`AutomaticMaskGenerator` that rasterises a point-grid's masks into the
fixed-budget id map consumed by ``losses.mask_cons_loss``.

Weights import from a segment-anything ``.pth`` checkpoint via
:func:`import_sam_checkpoint` (no torch-side code needed beyond torch.load).
Variants: vit_b (12 layers, 768), vit_l (24, 1024), vit_h (32, 1280).
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

VARIANTS = {
    "vit_b": dict(depth=12, dim=768, heads=12, global_idx=(2, 5, 8, 11)),
    "vit_l": dict(depth=24, dim=1024, heads=16, global_idx=(5, 11, 17, 23)),
    "vit_h": dict(depth=32, dim=1280, heads=16, global_idx=(7, 15, 23, 31)),
}


class MLPBlock(nn.Module):
    dim: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="lin1")(x)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, name="lin2")(h)


class WindowAttention(nn.Module):
    """ViTDet-style attention with optional windowing + relative positions."""

    dim: int
    heads: int
    window: int  # 0 = global

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        win = self.window or max(h, w)
        pad_h = (-h) % win
        pad_w = (-w) % win
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hh, ww = x.shape[1], x.shape[2]
        nh, nw = hh // win, ww // win
        xw = x.reshape(b, nh, win, nw, win, c).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(b * nh * nw, win * win, c)

        qkv = nn.Dense(3 * self.dim, name="qkv")(xw)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = self.dim // self.heads

        def heads_split(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, hd
                             ).transpose(0, 2, 1, 3)

        q, k, v = map(heads_split, (q, k, v))
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)

        # decomposed relative position embeddings (SAM/ViTDet)
        rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                           (2 * win - 1, hd))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                           (2 * win - 1, hd))
        coords = jnp.arange(win)
        rel = coords[:, None] - coords[None, :] + win - 1  # (win, win)
        rh = rel_h[rel]  # (win, win, hd)
        rw = rel_w[rel]
        qg = q.reshape(-1, self.heads, win, win, hd)
        bias_h = jnp.einsum("bhxyd,xud->bhxyu", qg, rh)  # (B,h,x,y,u)
        bias_w = jnp.einsum("bhxyd,yvd->bhxyv", qg, rw)
        bias = (bias_h[..., :, None] + bias_w[..., None, :]).reshape(
            -1, self.heads, win * win, win * win)
        attn = attn + bias

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(xw.shape[0], win * win, self.dim)
        out = nn.Dense(self.dim, name="proj")(out)

        out = out.reshape(b, nh, nw, win, win, c).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, hh, ww, c)
        if pad_h or pad_w:
            out = out[:, :h, :w]
        return out


class ViTBlock(nn.Module):
    dim: int
    heads: int
    window: int

    @nn.compact
    def __call__(self, x):
        x = x + WindowAttention(self.dim, self.heads, self.window,
                                name="attn")(nn.LayerNorm(name="norm1")(x))
        x = x + MLPBlock(self.dim, name="mlp")(nn.LayerNorm(name="norm2")(x))
        return x


class ImageEncoderViT(nn.Module):
    variant: str = "vit_b"
    img_size: int = 1024
    patch: int = 16
    out_chans: int = 256
    window: int = 14

    @nn.compact
    def __call__(self, x):
        cfgv = VARIANTS[self.variant]
        dim, depth, heads = cfgv["dim"], cfgv["depth"], cfgv["heads"]
        x = nn.Conv(dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, self.img_size // self.patch,
                          self.img_size // self.patch, dim))
        if pos.shape[1:3] != x.shape[1:3]:
            pos = jax.image.resize(pos, (1, x.shape[1], x.shape[2], dim),
                                   "bilinear")
        x = x + pos
        for i in range(depth):
            window = 0 if i in cfgv["global_idx"] else self.window
            x = ViTBlock(dim, heads, window, name=f"block{i}")(x)
        # neck: 1x1 conv + LN + 3x3 conv + LN to 256 channels
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck0")(x)
        x = nn.LayerNorm(name="neck_ln0")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False,
                    name="neck1")(x)
        x = nn.LayerNorm(name="neck_ln1")(x)
        return x  # (B, H/16, W/16, 256)


class PromptEncoder(nn.Module):
    """Point prompts -> sparse embeddings; random-fourier positional encoding.

    Weight-compatible with segment-anything's ``PromptEncoder`` point path
    (``prompt_encoder.py``): pixel coords are shifted by +0.5 (pixel centers),
    a padding point with label -1 is appended by the caller when no box prompt
    exists, and labels map -1 -> not_a_point (PE zeroed), 0 -> negative,
    1 -> positive. ``no_mask_embed`` provides the dense embedding the decoder
    adds to the image features when no mask prompt is given."""

    embed_dim: int = 256

    @nn.compact
    def __call__(self, points, labels, image_size):
        """points (B, N, 2) in pixel coords; labels (B, N) 1=fg, 0=bg,
        -1=padding.

        Returns (sparse_embeddings, pe_gaussian, no_mask_embed)."""
        pe_gaussian = self.param("pe_gaussian", nn.initializers.normal(1.0),
                                 (2, self.embed_dim // 2))
        coords = (points + 0.5) / jnp.asarray(image_size, jnp.float32)
        coords = 2 * coords - 1
        proj = coords @ pe_gaussian * (2 * np.pi)
        pe = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        fg = self.param("fg_embed", nn.initializers.normal(1.0),
                        (self.embed_dim,))
        bg = self.param("bg_embed", nn.initializers.normal(1.0),
                        (self.embed_dim,))
        not_a_point = self.param("not_a_point_embed",
                                 nn.initializers.normal(1.0),
                                 (self.embed_dim,))
        no_mask = self.param("no_mask_embed", nn.initializers.normal(1.0),
                             (self.embed_dim,))
        lab = labels[..., None]
        pe = jnp.where(lab == -1, 0.0, pe)
        type_emb = jnp.where(lab == -1, not_a_point,
                             jnp.where(lab > 0, fg, bg))
        return pe + type_emb, pe_gaussian, no_mask


def dense_positional_encoding(pe_gaussian, grid_hw):
    """Positional encoding of the feature grid (for the decoder)."""
    h, w = grid_hw
    ys = (jnp.arange(h) + 0.5) / h
    xs = (jnp.arange(w) + 0.5) / w
    grid = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), -1)  # (h, w, 2)
    coords = 2 * grid[..., ::-1] - 1
    proj = coords @ pe_gaussian * (2 * np.pi)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class DecoderAttention(nn.Module):
    """segment-anything ``transformer.Attention``: q/k/v projections to
    dim / downsample_rate, multi-head attention, out projection back."""

    dim: int = 256
    heads: int = 8
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d = self.dim // self.downsample_rate
        qh = nn.Dense(d, name="q_proj")(q)
        kh = nn.Dense(d, name="k_proj")(k)
        vh = nn.Dense(d, name="v_proj")(v)
        hd = d // self.heads

        def sp(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, hd
                             ).transpose(0, 2, 1, 3)

        a = jnp.einsum("bhqd,bhkd->bhqk", sp(qh), sp(kh)) / np.sqrt(hd)
        a = jax.nn.softmax(a, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, sp(vh))
        o = o.transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1], d)
        return nn.Dense(self.dim, name="out_proj")(o)


class TwoWayBlock(nn.Module):
    """segment-anything ``TwoWayAttentionBlock``: token self-attention,
    token->image cross-attention, ReLU MLP, image->token cross-attention
    (``transformer.py``). The first transformer layer skips the positional
    encoding in its self-attention and takes the attention output directly
    (no residual)."""

    dim: int = 256
    heads: int = 8
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, qpe, kpe):
        if self.skip_first_layer_pe:
            queries = DecoderAttention(self.dim, self.heads,
                                       name="self_attn")(queries, queries,
                                                         queries)
        else:
            q = queries + qpe
            queries = queries + DecoderAttention(
                self.dim, self.heads, name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(name="norm1")(queries)

        q = queries + qpe
        k = keys + kpe
        queries = queries + DecoderAttention(
            self.dim, self.heads, downsample_rate=2,
            name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(name="norm2")(queries)

        h = nn.Dense(self.mlp_dim, name="mlp.lin1")(queries)
        h = nn.relu(h)
        queries = queries + nn.Dense(self.dim, name="mlp.lin2")(h)
        queries = nn.LayerNorm(name="norm3")(queries)

        q = queries + qpe
        k = keys + kpe
        keys = keys + DecoderAttention(
            self.dim, self.heads, downsample_rate=2,
            name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(name="norm4")(keys)
        return queries, keys


class HyperMLP(nn.Module):
    """3-layer MLP (ReLU between layers, none after the last) — the mask
    hypernetworks and the IoU head of segment-anything's ``MaskDecoder``."""

    hidden: int
    out: int
    depth: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth - 1):
            x = nn.relu(nn.Dense(self.hidden, name=f"layers.{i}")(x))
        return nn.Dense(self.out, name=f"layers.{self.depth - 1}")(x)


class MaskDecoder(nn.Module):
    """segment-anything ``MaskDecoder`` (``mask_decoder.py``): two-way
    transformer (2 layers + final token-to-image attention), 4x output
    upscaler, per-mask-token 3-layer hypernetwork MLPs, 3-layer IoU head."""

    dim: int = 256
    num_mask_tokens: int = 4  # num_multimask_outputs(3) + 1
    iou_head_hidden: int = 256
    mlp_dim: int = 2048

    @nn.compact
    def __call__(self, img_embed, img_pe, sparse_prompt, dense_prompt=None):
        b = img_embed.shape[0]
        h, w = img_embed.shape[1:3]
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, self.dim))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (self.num_mask_tokens, self.dim))
        tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.broadcast_to(tokens[None], (b,) + tokens.shape)
        tokens = jnp.concatenate([tokens, sparse_prompt], axis=1)

        src = img_embed
        if dense_prompt is not None:
            src = src + dense_prompt
        keys = src.reshape(b, h * w, self.dim)
        kpe = jnp.broadcast_to(img_pe.reshape(1, h * w, self.dim), keys.shape)

        q, k = tokens, keys
        for i in range(2):
            q, k = TwoWayBlock(self.dim, mlp_dim=self.mlp_dim,
                               skip_first_layer_pe=(i == 0),
                               name=f"layers.{i}")(q, k, tokens, kpe)
        # final attention of tokens onto the image + layer norm
        q = q + DecoderAttention(self.dim, downsample_rate=2,
                                 name="final_attn_token_to_image")(
            q + tokens, k + kpe, k)
        q = nn.LayerNorm(name="norm_final_attn")(q)

        src = k.reshape(b, h, w, self.dim)
        # output_upscaling: tconv -> LayerNorm2d -> GELU -> tconv -> GELU
        up = nn.ConvTranspose(self.dim // 4, (2, 2), strides=(2, 2),
                              name="up1")(src)
        up = nn.LayerNorm(name="up_ln")(up)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(self.dim // 8, (2, 2), strides=(2, 2),
                              name="up2")(up)
        up = nn.gelu(up, approximate=False)

        # per-token hypernetwork MLPs: dim -> dim -> dim -> dim/8
        hyper = jnp.stack([
            HyperMLP(self.dim, self.dim // 8, name=f"hyper_mlps.{i}")(
                q[:, 1 + i])
            for i in range(self.num_mask_tokens)], axis=1)  # (B, M, d/8)
        masks = jnp.einsum("bmd,bhwd->bmhw", hyper, up)
        iou_pred = HyperMLP(self.iou_head_hidden, self.num_mask_tokens,
                            name="iou_head")(q[:, 0])
        return masks, iou_pred


class SAM(nn.Module):
    variant: str = "vit_b"
    img_size: int = 1024

    def setup(self):
        self.image_encoder = ImageEncoderViT(self.variant, self.img_size)
        self.prompt_encoder = PromptEncoder()
        self.mask_decoder = MaskDecoder()

    def encode(self, image):
        return self.image_encoder(image)

    def decode(self, img_embed, points, labels):
        h, w = img_embed.shape[1:3]
        b = points.shape[0]
        # point-only prompts get a padding point (label -1), exactly like
        # segment-anything's _embed_points with pad=True (no box prompt)
        points = jnp.concatenate([points, jnp.zeros((b, 1, 2))], axis=1)
        labels = jnp.concatenate([labels, -jnp.ones((b, 1))], axis=1)
        sparse, pe_gaussian, no_mask = self.prompt_encoder(
            points, labels, (self.img_size, self.img_size))
        pe = dense_positional_encoding(pe_gaussian, (h, w))
        masks, iou = self.mask_decoder(img_embed, pe[None], sparse, no_mask)
        return masks, iou

    def __call__(self, image, points, labels):
        emb = self.encode(image)
        return self.decode(emb, points, labels)


def import_sam_checkpoint(state_dict, variant="vit_h",
                          parts=("image_encoder", "prompt_encoder",
                                 "mask_decoder")):
    """Map a segment-anything ``.pth`` state_dict onto this flax SAM's names.

    Returns a flat ``name -> numpy array`` dict for
    ``mopa_tpu.models.torch_compat.unflatten_into`` against ``SAM.init``
    variables["params"]. Covers the image encoder, the prompt encoder's point
    path (point embeddings, not_a_point, no_mask) and the FULL mask decoder
    (two-way transformer, final token-to-image attention, output upscaler,
    per-token hypernetwork MLPs, IoU head). Only the box-corner point
    embeddings (2, 3) and the mask-prompt downscaler are skipped — box and
    mask prompts are outside MoPA's consumption chain
    (``mopa/data/sam_refine.py:127-248`` uses point grids only).
    """
    import numpy as np

    from mopa_tpu.models.torch_compat import _t_tconv

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out = {}

    def conv(src, dst, bias=True):
        out[dst + ".kernel"] = np.transpose(sd[src + ".weight"], (2, 3, 1, 0))
        if bias and src + ".bias" in sd:
            out[dst + ".bias"] = sd[src + ".bias"]

    def tconv(src, dst):
        out[dst + ".kernel"] = _t_tconv(sd[src + ".weight"])
        if src + ".bias" in sd:
            out[dst + ".bias"] = sd[src + ".bias"]

    def dense(src, dst):
        out[dst + ".kernel"] = np.transpose(sd[src + ".weight"], (1, 0))
        if src + ".bias" in sd:
            out[dst + ".bias"] = sd[src + ".bias"]

    def ln(src, dst):
        out[dst + ".scale"] = sd[src + ".weight"]
        out[dst + ".bias"] = sd[src + ".bias"]

    if "image_encoder" in parts:
        enc = "image_encoder"
        conv(enc + ".patch_embed.proj", "image_encoder.patch_embed")
        out["image_encoder.pos_embed"] = sd[enc + ".pos_embed"]
        depth = VARIANTS[variant]["depth"]
        for i in range(depth):
            s = "{}.blocks.{}".format(enc, i)
            d = "image_encoder.block{}".format(i)
            ln(s + ".norm1", d + ".norm1")
            ln(s + ".norm2", d + ".norm2")
            dense(s + ".attn.qkv", d + ".attn.qkv")
            dense(s + ".attn.proj", d + ".attn.proj")
            out[d + ".attn.rel_pos_h"] = sd[s + ".attn.rel_pos_h"]
            out[d + ".attn.rel_pos_w"] = sd[s + ".attn.rel_pos_w"]
            dense(s + ".mlp.lin1", d + ".mlp.lin1")
            dense(s + ".mlp.lin2", d + ".mlp.lin2")
        conv(enc + ".neck.0", "image_encoder.neck0", bias=False)
        ln(enc + ".neck.1", "image_encoder.neck_ln0")
        conv(enc + ".neck.2", "image_encoder.neck1", bias=False)
        ln(enc + ".neck.3", "image_encoder.neck_ln1")

    if "prompt_encoder" in parts:
        pe = "prompt_encoder"
        out["prompt_encoder.pe_gaussian"] = \
            sd[pe + ".pe_layer.positional_encoding_gaussian_matrix"]
        # point_embeddings: 0 = negative, 1 = positive (segment-anything)
        out["prompt_encoder.bg_embed"] = \
            sd[pe + ".point_embeddings.0.weight"][0]
        out["prompt_encoder.fg_embed"] = \
            sd[pe + ".point_embeddings.1.weight"][0]
        out["prompt_encoder.not_a_point_embed"] = \
            sd[pe + ".not_a_point_embed.weight"][0]
        out["prompt_encoder.no_mask_embed"] = \
            sd[pe + ".no_mask_embed.weight"][0]

    if "mask_decoder" not in parts:
        return out

    md = "mask_decoder"
    out["mask_decoder.iou_token"] = sd[md + ".iou_token.weight"]
    out["mask_decoder.mask_tokens"] = sd[md + ".mask_tokens.weight"]

    def decoder_attn(src, dst):
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            dense("{}.{}".format(src, p), "{}.{}".format(dst, p))

    tr = md + ".transformer"
    for i in range(2):
        s = "{}.layers.{}".format(tr, i)
        d = "{}.layers.{}".format(md, i)
        decoder_attn(s + ".self_attn", d + ".self_attn")
        decoder_attn(s + ".cross_attn_token_to_image",
                     d + ".cross_attn_token_to_image")
        decoder_attn(s + ".cross_attn_image_to_token",
                     d + ".cross_attn_image_to_token")
        dense(s + ".mlp.lin1", d + ".mlp.lin1")
        dense(s + ".mlp.lin2", d + ".mlp.lin2")
        for n in ("norm1", "norm2", "norm3", "norm4"):
            ln("{}.{}".format(s, n), "{}.{}".format(d, n))
    decoder_attn(tr + ".final_attn_token_to_image",
                 md + ".final_attn_token_to_image")
    ln(tr + ".norm_final_attn", md + ".norm_final_attn")

    tconv(md + ".output_upscaling.0", md + ".up1")
    ln(md + ".output_upscaling.1", md + ".up_ln")
    tconv(md + ".output_upscaling.3", md + ".up2")

    for i in range(4):
        for j in range(3):
            dense("{}.output_hypernetworks_mlps.{}.layers.{}".format(md, i, j),
                  "{}.hyper_mlps.{}.layers.{}".format(md, i, j))
    for j in range(3):
        dense("{}.iou_prediction_head.layers.{}".format(md, j),
              "{}.iou_head.layers.{}".format(md, j))
    return out


def generate_mask_id_map(apply_fn, variables, image, *, points_per_side=8,
                         mask_budget=64, iou_thresh=0.7, img_size=256):
    """Automatic mask generation -> fixed-budget id map (jit-compatible).

    A points_per_side^2 grid of foreground point prompts each predicts one
    mask (best-of-4 by IoU score); masks below ``iou_thresh`` are dropped;
    surviving masks are rasterised largest-first like the reference's
    area-sorted id map (sam_refine.py:127-152). Returns (H, W) int32 with
    -100 for unassigned.
    """
    n = points_per_side
    h = w = img_size
    xs = (jnp.arange(n) + 0.5) / n * w
    ys = (jnp.arange(n) + 0.5) / n * h
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="ij"), -1).reshape(-1, 2)
    points = grid[None, :, None, :]  # one prompt per "batch" of tokens

    emb = apply_fn(variables, image[None], method=SAM.encode)

    def one_prompt(pt):
        masks, iou = apply_fn(variables, emb, pt[None, None, :],
                              jnp.ones((1, 1)), method=SAM.decode)
        best = jnp.argmax(iou[0])
        m = masks[0, best]
        score = iou[0, best]
        # upscale from H/4 to full res
        m = jax.image.resize(m, (h, w), "bilinear")
        return m > 0, score

    masks, scores = jax.lax.map(one_prompt, grid)
    areas = jnp.sum(masks, axis=(1, 2))
    ok = scores > iou_thresh
    order = jnp.argsort(-jnp.where(ok, areas, -1))
    id_map = jnp.full((h, w), -100, jnp.int32)
    budget = min(mask_budget, n * n)

    def body(i, id_map):
        k = order[i]
        write = ok[k] & masks[k]
        return jnp.where(write, i, id_map)

    id_map = jax.lax.fori_loop(0, budget, body, id_map)
    return id_map
