#!/usr/bin/env python
"""Micro-benchmarks that decide the round-5 sparse-conv strategy.

The full MoPA step is gather-rate-bound (VERDICT r4: MFU 4.4%). Two
candidate fixes need hardware answers before committing:

  1. What row rate does XLA's fused gather actually reach at the wide-conv
     shapes (3.1M rows of 3C lanes per level-0 conv)?  -> `xla`
  2. Can Mosaic lower a vectorized row gather from a VMEM-resident table
     (``jnp.take(table, idx, axis=0)`` inside a pallas kernel), and at what
     rate? If yes, a fused gather+GEMM+BN level kernel keeps the (V, 27C)
     aligned array out of HBM entirely.  -> `pallas`, `fused`

Usage: python tools/gather_micro.py [--probes xla,pallas,fused] [-n 20]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

from mopa_tpu.common.cache import enable_compile_cache


def timed(fn, *args, n=20, name=""):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1e3:.3f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", default="xla,pallas,fused")
    ap.add_argument("-n", type=int, default=20)
    args = ap.parse_args()
    probes = args.probes.split(",")
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    # level-0 shape of the fused 3-domain batch: 24 samples x 16,384 slots,
    # C=16, 8 wide columns -> 3.1M gather rows of 3C=48 lanes
    S, V, C = 24, 16384, 16
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(S, V, 3 * C)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    # monotone-ish ranks like real plans (sorted per column)
    ranks = np.sort(rng.integers(0, V, size=(S, V * 8)), axis=1).astype(
        np.int32)
    ranks_j = jnp.asarray(ranks)

    if "xla" in probes:
        @jax.jit
        def xla_gather(f, r):
            flat_f = f.reshape(S * V, 3 * C)
            off = (jnp.arange(S, dtype=jnp.int32) * V)[:, None]
            g = flat_f[(r + off).reshape(-1)]
            return jnp.sum(g.astype(jnp.float32))

        dt = timed(xla_gather, feats, ranks_j, n=args.n, name="xla_gather")
        rows = S * V * 8
        print(f"  -> {rows / dt / 1e6:.1f} M rows/s,"
              f" {rows * 3 * C * 2 / dt / 1e9:.1f} GB/s")

    if "pallas" in probes:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kern(f_ref, r_ref, o_ref):
            tab = f_ref[:]                       # (V, 3C) in VMEM
            idx = r_ref[:]                       # (V*8,)
            g = jnp.take(tab, idx, axis=0)       # the decisive op
            o_ref[:] = g

        @jax.jit
        def pallas_gather(f, r):
            out = pl.pallas_call(
                kern,
                grid=(S,),
                in_specs=[
                    pl.BlockSpec((1, V, 3 * C), lambda s: (s, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, V * 8), lambda s: (s, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, V * 8, 3 * C), lambda s: (s, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((S, V * 8, 3 * C),
                                               jnp.bfloat16),
            )(f[:, None].reshape(S, V, 3 * C), r)
            return jnp.sum(out.astype(jnp.float32))

        try:
            dt = timed(pallas_gather, feats, ranks_j, n=args.n,
                       name="pallas_vmem_gather")
            rows = S * V * 8
            print(f"  -> {rows / dt / 1e6:.1f} M rows/s")
        except Exception as e:  # noqa: BLE001 - report lowering failures
            print(f"pallas_vmem_gather: FAILED ({type(e).__name__}: {e})"
                  [:500])

    if "fused" in probes:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        Cout = 16
        w = jnp.asarray(rng.normal(size=(24 * C, Cout)).astype(np.float32)
                        ).astype(jnp.bfloat16)

        def kern(f_ref, r_ref, w_ref, o_ref):
            tab = f_ref[0]                        # (V, 3C)
            idx = r_ref[0]                        # (V*8,)
            g = jnp.take(tab, idx, axis=0)        # (V*8, 3C)
            a = g.reshape(V, 24 * C)
            o_ref[0] = jnp.dot(a, w_ref[:],
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)

        @jax.jit
        def fused(f, r, w):
            out = pl.pallas_call(
                kern,
                grid=(S,),
                in_specs=[
                    pl.BlockSpec((1, V, 3 * C), lambda s: (s, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, V * 8), lambda s: (s, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((24 * C, Cout), lambda s: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, V, Cout), lambda s: (s, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((S, V, Cout), jnp.bfloat16),
            )(f.reshape(S, V, 3 * C), r, w)
            return jnp.sum(out.astype(jnp.float32))

        try:
            timed(fused, feats, ranks_j, w, n=args.n, name="fused_gather_gemm")
        except Exception as e:  # noqa: BLE001
            print(f"fused_gather_gemm: FAILED ({type(e).__name__}: {e})"[:500])

        # reference: the current XLA wide-conv forward at the same shape
        @jax.jit
        def xla_conv(f, r, w):
            flat_f = f.reshape(S * V, 3 * C)
            off = (jnp.arange(S, dtype=jnp.int32) * V)[:, None]
            g = flat_f[(r + off).reshape(-1)]
            a = g.reshape(S * V, 24 * C)
            return jnp.sum(jnp.dot(a, w, preferred_element_type=jnp.float32))

        timed(xla_conv, feats, ranks_j, w, n=args.n, name="xla_gather_gemm")


if __name__ == "__main__":
    main()
