#!/usr/bin/env python
"""Micro-benchmark: what conv/matmul rate can this chip actually hit?

Times a reference bf16 matmul, a single production-shape 3x3 conv, the same
conv's fwd+bwd, and the full UNetResNet34 fwd / fwd+bwd at the bench image
size — so the 2D stack's recorded 90 ms fwd+bwd can be attributed to either
the chip/XLA conv path or to this model's structure (BN casts, decoder, odd
shapes).

Methodology (axon): ``block_until_ready`` resolves at schedule time, eager
ops cost ~2 ms/MB, AND chaining a large carry between separate dispatches
pays a similar per-hop link cost (a 32 MB-carry matmul chain reads 55 ms/it
when the matmul itself is <1 ms). The only trustworthy device time is a
single dispatch that runs the op N times inside ``lax.fori_loop`` and
returns ONE scalar; per-iter time = (total - rtt) / N. The loop carry feeds
each iteration's output into the next input, so XLA cannot elide iterations.

Run: python tools/conv2d_micro.py            (TPU)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from mopa_tpu.common.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("MICRO_ITERS", 20))


def timed_loop(body, carry, n=N):
    """One dispatch: n x body inside fori_loop, one scalar out."""

    @jax.jit
    def run(carry):
        out = jax.lax.fori_loop(0, n, lambda i, c: body(c), carry)
        return jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)
                       .ravel()[:1])

    _ = float(run(carry))  # compile + warm
    t0 = time.time()
    s = float(run(carry))
    dt = (time.time() - t0) * 1e3
    assert np.isfinite(s)
    return dt / n  # ms/iter (includes rtt/n, negligible at n>=20)


def main():
    results = {}

    def rec(k, v):
        results[k] = v
        print(f"  {k} = {v}", flush=True)

    key = jax.random.PRNGKey(0)

    # 0. pure dispatch round trip (scalar chain, one dispatch per hop)
    s = jnp.float32(0.0)
    jf = jax.jit(lambda s: s + 1)
    _ = float(jf(s))
    t0 = time.time()
    out = s
    for _ in range(40):
        out = jf(out)
    _ = float(out)
    rec("rtt_ms", round((time.time() - t0) / 40 * 1e3, 3))

    # 1. reference MXU rate: bf16 4096^3 matmul (137 GFLOP)
    a = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    ms = timed_loop(lambda c: (c @ a) * 0.001 + 1e-6, a)
    rec("matmul4k_ms", round(ms, 3))
    rec("matmul4k_tflops", round(2 * 4096**3 / (ms * 1e-3) / 1e12, 1))

    # 2. single production-shape conv: 8x304x480x64 -> 64, 3x3 bf16 (86 GFLOP)
    x = jax.random.normal(key, (8, 304, 480, 64), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 64, 64), jnp.bfloat16) * 0.04
    gf = 2 * 8 * 304 * 480 * 64 * 64 * 9 / 1e9

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ms = timed_loop(lambda c: conv(c, w) * 0.04 + 1e-6, x)
    rec("conv3x3_ms", round(ms, 3))
    rec("conv3x3_tflops", round(gf / ms, 1))

    # 3. conv fwd+bwd (grad wrt weights; SGD chain on w inside the loop)
    def loss(w, x):
        return jnp.sum(conv(x, w).astype(jnp.float32) ** 2)

    ms = timed_loop(lambda c: c - 1e-12 * jax.grad(loss)(c, x), w)
    rec("conv3x3_bwd_ms", round(ms, 3))
    rec("conv3x3_bwd_tflops", round(3 * gf / ms, 1))

    # 4. full UNetResNet34 fwd / fwd+bwd at bench size
    from mopa_tpu.models.resnet34_unet import UNetResNet34

    H, W = int(os.environ.get("IMG_H", 304)), int(os.environ.get("IMG_W", 480))
    model = UNetResNet34(pretrained=False, dtype=jnp.bfloat16)
    img = jax.random.normal(key, (8, H, W, 3), jnp.bfloat16)
    variables = model.init(key, img, train=False)

    def fwd_body(img):
        out = model.apply(variables, img, train=False)
        lead = jax.tree_util.tree_leaves(out)[0]
        s = jnp.mean(lead.astype(jnp.float32)) * 1e-9
        return img * (1 + s).astype(img.dtype)

    rec("unet2d_fwd_ms", round(timed_loop(fwd_body, img), 3))

    def loss2(params, bs, img):
        out, _ = model.apply({"params": params, "batch_stats": bs}, img,
                             train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
        lead = jax.tree_util.tree_leaves(out)[0]
        return jnp.sum(lead.astype(jnp.float32) ** 2)

    bs0 = variables["batch_stats"]

    def step_body(params):
        g = jax.grad(loss2)(params, bs0, img)
        return jax.tree_util.tree_map(lambda p, gg: p - 1e-12 * gg, params, g)

    rec("unet2d_fwdbwd_ms",
        round(timed_loop(step_body, variables["params"]), 3))

    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
