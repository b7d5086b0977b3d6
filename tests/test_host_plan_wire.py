"""Delta-compressed host-plan wire format (v3) decodes tree-exactly.

The native C++ builder (``native/mopa_loader.cpp::mopa_build_plan3``) ships
4-bit nibble delta-encoded ranks (8 non-center columns; the center column is
rank = slot - e0) and down maps, 24 packed non-center existence bits + 1
center bit per voxel, nibble octants and packed (pos << 11 | excess) fixups;
``scn_unet.plan_from_host_arrays`` must decode them into a UNetPlan
identical to ``build_unet_plan_batched``'s on every load-bearing element.
Guards the monotonicity + hold-on-miss + saturation-fixup contract between
the C++ encoder and the in-graph decoder (replaces the reference's reliance
on torchsparse/SCN C++ doing both sides, mopa/models/scn_unet.py:25-30).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from mopa_tpu.data import native_loader as nl
from mopa_tpu.models.scn_unet import (build_unet_plan_batched,
                                      plan_from_host_arrays)

pytestmark = pytest.mark.slow  # heavy: see pytest.ini


def _sample_batch(rng, s, p):
    coords_b, valid_b = [], []
    for _ in range(s):
        n = int(rng.integers(3 * p // 5, p))
        c = rng.integers(0, 40, size=(n, 3)).astype(np.int32)
        c[:, 2] = rng.integers(0, 12, n)  # z-dense columns like LiDAR
        key = (c[:, 0].astype(np.int64) * 4096 + c[:, 1]) * 4096 + c[:, 2]
        c = c[np.argsort(key, kind="stable")]
        c = np.concatenate([c, np.zeros((p - n, 3), np.int32)])
        coords_b.append(c)
        valid_b.append(np.arange(p) < n)
    return np.stack(coords_b), np.stack(valid_b)


def test_host_plan_wire_decodes_exactly():
    if not nl.available():
        pytest.skip("native loader unavailable")
    rng = np.random.default_rng(0)
    s, p, L = 3, 512, 4
    caps = [512, 384, 256, 128]
    coords_b, valid_b = _sample_batch(rng, s, p)
    doms = np.array([0, 1, 1], np.int32)

    ref = build_unet_plan_batched(jnp.asarray(coords_b), jnp.asarray(valid_b),
                                  L, capacities=caps, sample_domains=doms)
    per = [nl.build_plan_arrays(coords_b[i], valid_b[i], caps)
           for i in range(s)]
    assert all(h is not None for h in per)
    arrs = {k: jnp.asarray(np.stack([h[k] for h in per])) for k in per[0]}
    dec = plan_from_host_arrays(arrs, caps, L, sample_domains=doms)

    def a(x):
        return None if x is None else np.asarray(x)

    for l in range(L):
        r, d = ref.levels[l], dec.levels[l]
        np.testing.assert_array_equal(a(r.valid), a(d.valid),
                                      err_msg=f"valid L{l}")
        np.testing.assert_array_equal(a(r.sel), a(d.sel), err_msg=f"sel L{l}")
        # miss rows gather dead values (sel == 63 masks them); only live
        # window starts are load-bearing
        live = a(r.sel) != 63
        np.testing.assert_array_equal(a(r.ranks)[live], a(d.ranks)[live],
                                      err_msg=f"ranks L{l}")
        if l >= 1:
            np.testing.assert_array_equal(a(r.down_nbr), a(d.down_nbr),
                                          err_msg=f"down L{l}")
            np.testing.assert_array_equal(a(r.f2c), a(d.f2c),
                                          err_msg=f"f2c L{l}")
            np.testing.assert_array_equal(a(r.up_off), a(d.up_off),
                                          err_msg=f"upoff L{l}")
        np.testing.assert_array_equal(a(r.dom), a(d.dom), err_msg=f"dom L{l}")
    np.testing.assert_array_equal(a(ref.point_inverse), a(dec.point_inverse))
    np.testing.assert_array_equal(a(ref.point_counts), a(dec.point_counts))
    np.testing.assert_array_equal(a(ref.num_voxels), a(dec.num_voxels))


def test_host_plan_fixups_exercised():
    """Force saturating rank deltas (huge key jumps) and check exact decode."""
    if not nl.available():
        pytest.skip("native loader unavailable")
    rng = np.random.default_rng(7)
    p, L = 768, 3
    caps = [768, 512, 256]
    # widely-scattered x so per-column rank jumps blow past one nibble
    n = 700
    c = np.stack([rng.integers(0, 3000, n), rng.integers(0, 50, n),
                  rng.integers(0, 8, n)], 1).astype(np.int32)
    key = (c[:, 0].astype(np.int64) * 4096 + c[:, 1]) * 4096 + c[:, 2]
    c = c[np.argsort(key, kind="stable")]
    c = np.concatenate([c, np.zeros((p - n, 3), np.int32)])
    valid = np.arange(p) < n
    h = nl.build_plan_arrays(c, valid, caps)
    assert h is not None
    assert (h["fix"] >= 0).sum() > 0, "test data produced no fixups"
    ref = build_unet_plan_batched(jnp.asarray(c[None]),
                                  jnp.asarray(valid[None]), L,
                                  capacities=caps)
    arrs = {k: jnp.asarray(v[None]) for k, v in h.items()}
    dec = plan_from_host_arrays(arrs, caps, L)
    for l in range(L):
        live = np.asarray(ref.levels[l].sel) != 63
        np.testing.assert_array_equal(
            np.asarray(ref.levels[l].ranks)[live],
            np.asarray(dec.levels[l].ranks)[live], err_msg=f"ranks L{l}")
        if l >= 1:
            np.testing.assert_array_equal(np.asarray(ref.levels[l].down_nbr),
                                          np.asarray(dec.levels[l].down_nbr),
                                          err_msg=f"down L{l}")

