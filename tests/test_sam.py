import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mopa_tpu.models import sam as sam_mod


@pytest.fixture(scope="module")
def tiny_sam():
    # a tiny variant for tests
    sam_mod.VARIANTS["vit_t"] = dict(depth=2, dim=64, heads=4, global_idx=(1,))
    model = sam_mod.SAM(variant="vit_t", img_size=64)
    img = np.zeros((1, 64, 64, 3), np.float32)
    pts = np.array([[[32.0, 32.0]]], np.float32)
    lab = np.ones((1, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img),
                           jnp.asarray(pts), jnp.asarray(lab))
    return model, variables


def test_sam_forward_shapes(tiny_sam):
    model, variables = tiny_sam
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    pts = np.array([[[10.0, 50.0]]], np.float32)
    lab = np.ones((1, 1), np.float32)
    masks, iou = jax.jit(model.apply)(variables, jnp.asarray(img),
                                      jnp.asarray(pts), jnp.asarray(lab))
    # encoder 64/16=4 -> decoder upsamples 4x -> 16
    assert masks.shape == (1, 4, 16, 16)
    assert iou.shape == (1, 4)
    assert np.isfinite(np.asarray(masks)).all()


def test_sam_automatic_mask_generator(tiny_sam):
    model, variables = tiny_sam
    rng = np.random.default_rng(1)
    img = rng.normal(size=(64, 64, 3)).astype(np.float32)
    id_map = sam_mod.generate_mask_id_map(
        model.apply, variables, jnp.asarray(img), points_per_side=4,
        mask_budget=8, iou_thresh=-1e9, img_size=64)
    id_map = np.asarray(id_map)
    assert id_map.shape == (64, 64)
    ids = np.unique(id_map)
    assert set(ids) <= set([-100] + list(range(8)))


# --------------------------------------------------------------------------- #
# Mask-decoder weight compatibility: minimal torch two-way decoder (mirroring
# segment-anything's transformer.py / mask_decoder.py) -> import -> parity.
# --------------------------------------------------------------------------- #

import math

import torch
import torch.nn as tnn
import torch.nn.functional as F

pytestmark = pytest.mark.slow  # heavy: see pytest.ini


class TAttn(tnn.Module):
    def __init__(self, dim, heads, rate=1):
        super().__init__()
        self.heads = heads
        d = dim // rate
        self.q_proj = tnn.Linear(dim, d)
        self.k_proj = tnn.Linear(dim, d)
        self.v_proj = tnn.Linear(dim, d)
        self.out_proj = tnn.Linear(d, dim)

    def forward(self, q, k, v):
        q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)
        b, n, d = q.shape
        hd = d // self.heads

        def sp(t):
            return t.reshape(b, -1, self.heads, hd).transpose(1, 2)

        q, k, v = sp(q), sp(k), sp(v)
        a = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
        a = torch.softmax(a, dim=-1)
        o = (a @ v).transpose(1, 2).reshape(b, n, d)
        return self.out_proj(o)


class TMLP2(tnn.Module):
    def __init__(self, dim, mlp_dim):
        super().__init__()
        self.lin1 = tnn.Linear(dim, mlp_dim)
        self.lin2 = tnn.Linear(mlp_dim, dim)

    def forward(self, x):
        return self.lin2(F.relu(self.lin1(x)))


class TTwoWayBlock(tnn.Module):
    def __init__(self, dim, heads, mlp_dim, skip_first_layer_pe):
        super().__init__()
        self.skip_first_layer_pe = skip_first_layer_pe
        self.self_attn = TAttn(dim, heads)
        self.norm1 = tnn.LayerNorm(dim)
        self.cross_attn_token_to_image = TAttn(dim, heads, 2)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = TMLP2(dim, mlp_dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.cross_attn_image_to_token = TAttn(dim, heads, 2)
        self.norm4 = tnn.LayerNorm(dim)

    def forward(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = self.norm2(
            queries + self.cross_attn_token_to_image(q, k, keys))
        queries = self.norm3(queries + self.mlp(queries))
        q = queries + query_pe
        k = keys + key_pe
        keys = self.norm4(keys + self.cross_attn_image_to_token(k, q, queries))
        return queries, keys


class TTwoWayTransformer(tnn.Module):
    def __init__(self, dim, heads, mlp_dim):
        super().__init__()
        self.layers = tnn.ModuleList(
            [TTwoWayBlock(dim, heads, mlp_dim, i == 0) for i in range(2)])
        self.final_attn_token_to_image = TAttn(dim, heads, 2)
        self.norm_final_attn = tnn.LayerNorm(dim)

    def forward(self, image_embedding, image_pe, point_embedding):
        # image_embedding/pe: (B, C, H, W) -> (B, HW, C)
        b, c, h, w = image_embedding.shape
        keys = image_embedding.flatten(2).permute(0, 2, 1)
        key_pe = image_pe.flatten(2).permute(0, 2, 1)
        queries = point_embedding
        for layer in self.layers:
            queries, keys = layer(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + self.final_attn_token_to_image(q, k, keys)
        return self.norm_final_attn(queries), keys


class TLayerNorm2d(tnn.Module):
    def __init__(self, c, eps=1e-6):
        super().__init__()
        self.weight = tnn.Parameter(torch.ones(c))
        self.bias = tnn.Parameter(torch.zeros(c))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class T3MLP(tnn.Module):
    def __init__(self, din, hidden, dout, depth=3):
        super().__init__()
        dims = [din] + [hidden] * (depth - 1)
        self.layers = tnn.ModuleList(
            [tnn.Linear(a, b) for a, b in zip(dims, dims[1:] + [dout])][:depth])

    def forward(self, x):
        for i, layer in enumerate(self.layers):
            x = F.relu(layer(x)) if i < len(self.layers) - 1 else layer(x)
        return x


class TMaskDecoder(tnn.Module):
    def __init__(self, dim=256, heads=8, mlp_dim=2048):
        super().__init__()
        self.transformer = TTwoWayTransformer(dim, heads, mlp_dim)
        self.iou_token = tnn.Embedding(1, dim)
        self.num_mask_tokens = 4
        self.mask_tokens = tnn.Embedding(self.num_mask_tokens, dim)
        self.output_upscaling = tnn.Sequential(
            tnn.ConvTranspose2d(dim, dim // 4, 2, 2), TLayerNorm2d(dim // 4),
            tnn.GELU(), tnn.ConvTranspose2d(dim // 4, dim // 8, 2, 2),
            tnn.GELU())
        self.output_hypernetworks_mlps = tnn.ModuleList(
            [T3MLP(dim, dim, dim // 8) for _ in range(self.num_mask_tokens)])
        self.iou_prediction_head = T3MLP(dim, 256, self.num_mask_tokens)

    def predict_masks(self, image_embeddings, image_pe, sparse_prompt,
                      dense_prompt):
        b = sparse_prompt.shape[0]
        output_tokens = torch.cat(
            [self.iou_token.weight, self.mask_tokens.weight], dim=0)
        tokens = torch.cat(
            [output_tokens.unsqueeze(0).expand(b, -1, -1), sparse_prompt], 1)
        src = image_embeddings + dense_prompt
        hs, src_out = self.transformer(src, image_pe, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1:1 + self.num_mask_tokens]
        h, w = image_embeddings.shape[2:]
        src_out = src_out.transpose(1, 2).reshape(b, -1, h, w)
        upscaled = self.output_upscaling(src_out)
        hyper = torch.stack(
            [self.output_hypernetworks_mlps[i](mask_tokens_out[:, i])
             for i in range(self.num_mask_tokens)], 1)
        bb, c, hh, ww = upscaled.shape
        masks = (hyper @ upscaled.reshape(bb, c, hh * ww)).reshape(
            bb, -1, hh, ww)
        iou_pred = self.iou_prediction_head(iou_token_out)
        return masks, iou_pred


class TPromptStub(tnn.Module):
    """Just the prompt-encoder tensors import_sam_checkpoint reads."""

    def __init__(self, dim=256):
        super().__init__()
        self.register_buffer("pe_gaussian_buf", torch.randn(2, dim // 2))
        self.point_embeddings = tnn.ModuleList(
            [tnn.Embedding(1, dim) for _ in range(4)])
        self.not_a_point_embed = tnn.Embedding(1, dim)
        self.no_mask_embed = tnn.Embedding(1, dim)


def test_sam_mask_decoder_import_parity():
    """import_sam_checkpoint must cover 100% of the flax mask-decoder params
    and reproduce torch outputs exactly (two-way transformer + final attn +
    upscaler + hypernetwork MLPs + iou head)."""
    from mopa_tpu.models.sam import MaskDecoder, import_sam_checkpoint
    from mopa_tpu.models.torch_compat import flatten_pytree, unflatten_into

    torch.manual_seed(0)
    dim = 64
    tdec = TMaskDecoder(dim=dim, heads=8, mlp_dim=128).eval()
    tpe = TPromptStub(dim)

    sd = {}
    for k, v in tdec.state_dict().items():
        sd["mask_decoder." + k] = v.numpy()
    for k, v in tpe.state_dict().items():
        if k == "pe_gaussian_buf":
            k = "pe_layer.positional_encoding_gaussian_matrix"
        sd["prompt_encoder." + k] = v.numpy()

    flat = import_sam_checkpoint(sd, parts=("prompt_encoder", "mask_decoder"))

    rng = np.random.default_rng(0)
    b, h, w, n = 1, 8, 8, 2
    img_embed = rng.normal(size=(b, h, w, dim)).astype(np.float32)
    img_pe = rng.normal(size=(1, h, w, dim)).astype(np.float32)
    sparse = rng.normal(size=(b, n, dim)).astype(np.float32)
    no_mask = sd["prompt_encoder.no_mask_embed.weight"][0]

    fdec = MaskDecoder(dim=dim, mlp_dim=128)
    variables = fdec.init(jax.random.PRNGKey(0), jnp.asarray(img_embed),
                          jnp.asarray(img_pe), jnp.asarray(sparse),
                          jnp.asarray(no_mask))
    # 100% coverage of the decoder's params
    model_keys = {"mask_decoder." + k
                  for k in flatten_pytree(variables["params"])}
    import_keys = {k for k in flat if k.startswith("mask_decoder.")}
    assert import_keys == model_keys, (
        sorted(model_keys - import_keys), sorted(import_keys - model_keys))

    params = unflatten_into(
        variables["params"],
        {k[len("mask_decoder."):]: v for k, v in flat.items()
         if k.startswith("mask_decoder.")})
    masks, iou = fdec.apply({"params": params}, jnp.asarray(img_embed),
                            jnp.asarray(img_pe), jnp.asarray(sparse),
                            jnp.asarray(no_mask))

    with torch.no_grad():
        t_embed = torch.from_numpy(np.transpose(img_embed, (0, 3, 1, 2)))
        t_pe = torch.from_numpy(np.transpose(img_pe, (0, 3, 1, 2)))
        t_masks, t_iou = tdec.predict_masks(
            t_embed, t_pe, torch.from_numpy(sparse),
            torch.from_numpy(no_mask)[None, :, None, None])

    np.testing.assert_allclose(np.asarray(masks), t_masks.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(iou), t_iou.numpy(),
                               rtol=1e-3, atol=1e-4)
