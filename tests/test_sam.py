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
