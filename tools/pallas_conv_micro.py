#!/usr/bin/env python
"""Micro A/B: fused Pallas submanifold conv vs the XLA wide path, on chip.

Two stages so the heavy plan-builder compile never blocks the TPU probe:

  gen   (CPU)  build a production-shape UNet plan (s=16 fused src+trg group,
               16,384-point budget, honest capacity schedule) and dump each
               level's wide-plan arrays to an npz.
  run   (TPU)  load the npz, per level time fwd and fwd+bwd for both paths
               and print a correctness check.

Usage:
    JAX_PLATFORMS=cpu python tools/pallas_conv_micro.py gen
    python tools/pallas_conv_micro.py run [-n 30] [--levels 0,1,2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

NPZ = "/tmp/pallas_micro_plan.npz"
S, P, M, LEVELS = 16, 16384, 16, 7


def synth_coords(rng):
    # LiDAR-ish synthetic coords: flat-ish z, wide xy
    pts = rng.normal(0, 14, size=(S, P, 3)) * np.array([1, 1, 0.18])
    return (pts - pts.min(axis=(0, 1))).astype(np.int32)


def gen():
    from mopa_tpu.common.cache import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from mopa_tpu.models import scn_unet

    caps = scn_unet.capacity_schedule(P, LEVELS)
    rng = np.random.default_rng(0)
    coords = synth_coords(rng)
    valid = np.ones((S, P), bool)
    plan = scn_unet.build_unet_plan_batched(
        jnp.asarray(coords), jnp.asarray(valid), LEVELS, capacities=caps)
    out = {"caps": np.asarray(caps)}
    for l, lv in enumerate(plan.levels):
        assert lv.ranks is not None and lv.sel is not None, f"L{l} not wide"
        out[f"ranks{l}"] = np.asarray(lv.ranks)
        out[f"sel{l}"] = np.asarray(lv.sel)
    np.savez(NPZ, **out)
    print("wrote", NPZ, "caps", list(out["caps"]), flush=True)


def run(n, levels, xla_only=False):
    from mopa_tpu.common.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from mopa_tpu.ops import sparse_conv as sc
    from mopa_tpu.ops import sparse_conv_pallas as scp

    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    d = np.load(NPZ)
    caps = [int(x) for x in d["caps"]]
    planes = [(i + 1) * M for i in range(LEVELS)]
    rng = np.random.default_rng(1)

    def timed(fn, *a):
        """In-jit loop timing: on axon, block_until_ready resolves at
        schedule time, eager ops cost ~2 ms/MB, and even CHAINING a large
        carry between separate dispatches pays a per-hop link cost — so the
        only trustworthy device time is ONE dispatch running ``fn`` n times
        inside ``lax.fori_loop`` (output feeds the next input, so XLA can't
        elide iterations) returning one scalar."""

        @jax.jit
        def loop(*args):
            first = jax.lax.fori_loop(
                0, n, lambda i, c: fn(c, *args[1:]), args[0])
            return jnp.sum(first.astype(jnp.float32).ravel()[:1])

        _ = float(loop(*a))  # compile + warm
        t0 = time.time()
        s = float(loop(*a))
        assert np.isfinite(s)
        return (time.time() - t0) / n * 1000

    for l in levels:
        cap, c = caps[l], planes[l]
        # plan arrays ride as ARGUMENTS, not closures: closed-over jnp
        # arrays become embedded program constants, and shipping multi-MB
        # constants to the remote compile service dominates compile time
        ranks = jnp.asarray(d[f"ranks{l}"])
        sel = jnp.asarray(d[f"sel{l}"])
        feats = jnp.asarray(rng.normal(size=(S * cap, c)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(27, c, c)) * 0.05, jnp.float32)

        def f_xla(x, wt, r, s):
            return sc.submanifold_conv_wide(x, sc.WidePlan(r, s), wt)

        def g_xla(x, wt, r, s):
            return jnp.sum(f_xla(x, wt, r, s).astype(jnp.float32) ** 2)

        t_fx = timed(lambda x, wt, r, s: f_xla(x, wt, r, s) * 0.04,
                     feats, w, ranks, sel)
        t_gx = timed(
            lambda x, wt, r, s: x - 1e-12
            * jax.grad(g_xla)(x, wt, r, s).astype(x.dtype),
            feats, w, ranks, sel)
        line = (f"L{l} cap={cap:6d} C={c:4d} rows={S*cap:7d}  "
                f"fwd xla {t_fx:7.2f}  fwd+bwd xla {t_gx:7.2f}")

        if not xla_only:
            lranks, lsel = scp.localize_plan(ranks, sel, cap, S)

            def f_pal(x, wt):
                return scp.submanifold_conv_wide_pallas(x, lranks, lsel, wt,
                                                        cap, S)

            def g_pal(x, wt):
                return jnp.sum(f_pal(x, wt).astype(jnp.float32) ** 2)

            o_x = jax.jit(f_xla)(feats, w, ranks, sel)
            o_p = jax.jit(f_pal)(feats, w)
            err = float(jnp.max(jnp.abs(o_x.astype(jnp.float32)
                                        - o_p.astype(jnp.float32))))

            t_fp = timed(lambda x, wt: f_pal(x, wt) * 0.04, feats, w)
            t_gp = timed(
                lambda x, wt: x - 1e-12
                * jax.grad(g_pal)(x, wt).astype(x.dtype),
                feats, w)
            line += f"  pal fwd {t_fp:7.2f} fwd+bwd {t_gp:7.2f} err {err:.2e}"
        print(line, flush=True)
    print("done", flush=True)


def gather_probe(n):
    """Raw XLA row-gather rate at the conv's access shape."""
    from mopa_tpu.common.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    for rows, width in [(124_000, 48), (124_000, 144), (87_000, 144),
                        (87_000, 432), (250_000, 48)]:
        tab = jnp.asarray(rng.normal(size=(rows, width)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, rows, size=(rows * 8,)), jnp.int32)

        # in-jit loop: the gather output perturbs the table so iterations
        # can't be elided; one scalar leaves the device (see timed())
        @jax.jit
        def loop(t, i):
            def body(_, t):
                g = jnp.take(t, i, axis=0)
                return t + 1e-9 * g[: t.shape[0]]

            return jnp.sum(jax.lax.fori_loop(0, n, body, t)
                           .astype(jnp.float32).ravel()[:1])

        _ = float(loop(tab, idx))
        t0 = time.time()
        _ = float(loop(tab, idx))
        dt = (time.time() - t0) / n
        gb = rows * 8 * width * 2 / 1e9
        print(f"gather rows={rows:7d} w={width:4d} -> {rows*8:8d} rows "
              f"{dt*1000:7.2f} ms  {rows*8/dt/1e6:7.1f} Mrows/s "
              f"{gb/dt:6.1f} GB/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["gen", "run", "gather"])
    ap.add_argument("-n", type=int, default=30)
    ap.add_argument("--levels", default="0,1,2,3,4,5,6")
    ap.add_argument("--xla-only", action="store_true")
    args = ap.parse_args()
    if args.stage == "gen":
        gen()
    elif args.stage == "gather":
        gather_probe(args.n)
    else:
        run(args.n, [int(x) for x in args.levels.split(",")],
            xla_only=args.xla_only)


if __name__ == "__main__":
    main()
