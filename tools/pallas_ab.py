#!/usr/bin/env python
"""A/B the fused Pallas submanifold conv against the XLA wide path on chip.

Times forward and fwd+bwd at the production fused-batch level shapes
(S samples x per-level capacity, the UNet's channel widths). Plans come
from LiDAR-like synthetic coordinate sets so neighbour hit rates match
training reality.

Usage: python tools/pallas_ab.py [--levels 0,1,2] [-n 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

from mopa_tpu.common.cache import enable_compile_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="0,1,2,3")
    ap.add_argument("-n", type=int, default=20)
    ap.add_argument("-s", type=int, default=24, help="fused samples")
    args = ap.parse_args()
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from mopa_tpu.models import scn_unet
    from mopa_tpu.ops import sparse_conv as sc
    from mopa_tpu.ops import sparse_conv_pallas as scp
    from mopa_tpu.ops import voxel as voxel_ops

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    caps = scn_unet.capacity_schedule(16384, 7)
    m = 16
    s = args.s

    def timed(fn, *a, n=args.n, name=""):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"  {name}: {dt * 1e3:.3f} ms")
        return dt

    for lstr in args.levels.split(","):
        l = int(lstr)
        cap = caps[l]
        cin = cout = (l + 1) * m
        # LiDAR-ish coords: ground rings + clusters, quantised at level scale
        p = 16384 >> l if l else 16384
        pts = rng.normal(scale=40.0 / (1 << l), size=(s, p, 3))
        coords = np.abs(pts).astype(np.int32) % 1024

        def one(c, v, sid):
            table, _, _ = voxel_ops.voxelize(
                c, jnp.full((c.shape[0],), sid, jnp.int32), v, cap)
            wide = sc.build_wide_plan(table)
            return wide.ranks, wide.sel, table.valid_mask()

        valid = np.ones((s, p), bool)
        ranks_b, sel_b, valid_b = jax.jit(jax.vmap(one))(
            jnp.asarray(coords), jnp.asarray(valid),
            jnp.arange(s, dtype=jnp.int32))
        off = (jnp.arange(s, dtype=jnp.int32) * cap)[:, None]
        ranks = jnp.where(ranks_b >= 0, ranks_b + off, -1).reshape(-1)
        sel = sel_b.reshape(-1)
        nact = int(jnp.sum(valid_b))
        print(f"level {l}: cap={cap} S={s} C={cin} active={nact}"
              f" ({nact / (s * cap):.2f})")

        feats = jnp.asarray(rng.normal(size=(s * cap, cin)).astype(np.float32)
                            ).astype(jnp.bfloat16)
        w = jnp.asarray((rng.normal(size=(27, cin, cout)) * 0.1
                         ).astype(np.float32)).astype(jnp.bfloat16)
        ct = jnp.asarray(rng.normal(size=(s * cap, cout)).astype(np.float32)
                         ).astype(jnp.bfloat16)
        lr, ls = scp.localize_plan(ranks, sel, cap, s)

        @jax.jit
        def wide_fwd(f, w_):
            return sc.submanifold_conv_wide(f, sc.WidePlan(ranks, sel), w_)

        @jax.jit
        def pal_fwd(f, w_):
            return scp.submanifold_conv_wide_pallas(f, lr, ls, w_, cap, s)

        @jax.jit
        def wide_grad(f, w_):
            def g(f_, w__):
                return jnp.sum(sc.submanifold_conv_wide(
                    f_, sc.WidePlan(ranks, sel), w__).astype(jnp.float32)
                    * ct.astype(jnp.float32))
            return jax.grad(g, argnums=(0, 1))(f, w_)

        @jax.jit
        def pal_grad(f, w_):
            def g(f_, w__):
                return jnp.sum(scp.submanifold_conv_wide_pallas(
                    f_, lr, ls, w__, cap, s).astype(jnp.float32)
                    * ct.astype(jnp.float32))
            return jax.grad(g, argnums=(0, 1))(f, w_)

        try:
            o_ref = wide_fwd(feats, w)
            o_pal = pal_fwd(feats, w)
            err = float(jnp.max(jnp.abs(o_ref.astype(jnp.float32)
                                        - o_pal.astype(jnp.float32))))
            print(f"  max fwd |delta|: {err:.4f}")
            timed(wide_fwd, feats, w, name="wide fwd")
            timed(pal_fwd, feats, w, name="pallas fwd")
            timed(wide_grad, feats, w, name="wide fwd+bwd")
            timed(pal_grad, feats, w, name="pallas fwd+bwd")
        except Exception as e:  # noqa: BLE001 - report lowering failures
            print(f"  FAILED: {type(e).__name__}: {e}"[:800])


if __name__ == "__main__":
    main()
