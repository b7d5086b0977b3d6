#!/usr/bin/env python
"""Speed-of-light analysis: is the MoPA step at XLA's gather rate ceiling?

MFU 4.4% (BENCH_r04/r05) says the step lives off the MXU. This tool grounds
that number in hardware terms by (1) counting the EXACT gather rows one full
fused train step issues (static shapes: rows are a closed-form function of
the capacity schedules and the conv row formulas in ``ops/sparse_conv.py``),
and (2) measuring the achieved XLA gather row rate at each level's true row
width, with the settled tunnel-safe methodology (BASELINE.md round 5: the
whole timed loop runs INSIDE one dispatch via ``lax.fori_loop`` with a
loop-dependent index offset so the gather cannot be hoisted, and one scalar
fetch is the only barrier).

Row formulas per level (fwd+bwd, from the custom VJPs):
  submanifold_conv_wide   16 * V      rows of 3C lanes   (8V fwd + 8V bwd)
  strided_conv (down)     8 * Vc + Vf rows of 2C / Cout  (4Vc fwd; 4Vc+Vf bwd)
  deconv                  2 * Vf + 4 * Vc                (Vf fwd; Vf+4Vc bwd)
UNet level l<L-1: 2 subm + 1 down + 1 deconv = 35*V_l + 12*V_{l+1};
deepest level: 1 subm = 16*V_{L-1}; stem: +16*V_0. Point pool/unpool adds
~3P point-wide rows/sample (P=16384) — included as ``point_rows``.

Prints one JSON line: rows/step, measured rate per width, the gather floor
in ms, and the max scans/s the step could reach if gathers were its ONLY
cost. Compare with the measured step (854 ms at these shapes, BASELINE.md).

Usage: python tools/gather_floor.py [-n 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

from mopa_tpu.common.cache import enable_compile_cache

BATCH = 8
POINTS = 16384
CAT_POINTS = 18432  # POINT_BUDGET + VGI object budget (collate cat domain)
M = 16
LEVELS = 7


def step_gather_rows(caps):
    """Exact fwd+bwd gather rows for one SparseUNet pass at ``caps``."""
    per_width = {}  # lane width -> rows

    def add(width, rows):
        per_width[width] = per_width.get(width, 0) + rows

    planes = [(i + 1) * M for i in range(LEVELS)]
    # stem: 27*in_ch -> m; gathers are 3*in_ch wide fwd, 3*m wide bwd
    add(3 * 1, 8 * caps[0])
    add(3 * M, 8 * caps[0])
    for l in range(LEVELS):
        p = planes[l]
        # conv1 (p->p) + conv2 (2p->p): fwd rows 3*Cin wide, bwd 3*Cout wide
        add(3 * p, 16 * caps[l])            # conv1 fwd(3p) + bwd(3p)
        if l + 1 < LEVELS:
            q = planes[l + 1]
            add(3 * 2 * p, 8 * caps[l])     # conv2 fwd (2p input)
            add(3 * p, 8 * caps[l])         # conv2 bwd (cotangent, p wide)
            # down p->q: fwd 4*Vc rows (2p wide); bwd 4*Vc (2p) + Vf (q wide)
            add(2 * p, 8 * caps[l + 1])
            add(q, caps[l])
            # deconv q->p: fwd Vf rows (q wide); bwd Vf (q) + 4*Vc (2p wide)
            add(q, 2 * caps[l])
            add(2 * p, 4 * caps[l + 1])
    return per_width


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=30)
    args = ap.parse_args()
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from mopa_tpu.models.scn_unet import capacity_schedule

    caps = capacity_schedule(POINTS, LEVELS)
    cat_caps = capacity_schedule(CAT_POINTS, LEVELS)

    rows = {}
    for c, mult in ((caps, 2 * BATCH), (cat_caps, BATCH)):  # src+trg, cat
        for w, r in step_gather_rows(c).items():
            rows[w] = rows.get(w, 0) + mult * r
    # point pool/unpool: ~3 point-wide gathers per sample-pass (P rows of m)
    point_rows = 3 * POINTS * 2 * BATCH + 3 * CAT_POINTS * BATCH
    rows[3 * M] = rows.get(3 * M, 0) + point_rows
    total_rows = int(sum(rows.values()))

    # ---- measure achieved gather rate per row width (in-dispatch loop) ----
    V = 16384
    S = 24  # fused-batch sample count at bench shapes
    rng = np.random.default_rng(0)
    ranks = np.sort(rng.integers(0, V, size=(S, V * 8)), axis=1).astype(
        np.int32)
    ranks_j = jnp.asarray(ranks.reshape(-1))
    off = (np.arange(S, dtype=np.int64) * V).repeat(V * 8).astype(np.int32)
    flat_idx = jnp.asarray(ranks.reshape(-1) + off)
    probe_rows = S * V * 8

    rate = {}
    for w in sorted(rows):
        feats = jnp.asarray(
            rng.normal(size=(S * V, w)).astype(np.float32)).astype(
                jnp.bfloat16)

        @jax.jit
        def bench(f, idx, n):
            def body(i, acc):
                # loop-dependent index offset: the gather cannot be hoisted
                j = jnp.clip(idx + (i % 2), 0, S * V - 1)
                g = f[j]
                # consume EVERY gathered row (a g[:1] peek would let XLA
                # dead-code-eliminate the gather down to one row); the sum
                # fuses into the gather, no (rows, w) materialisation
                return acc + jnp.sum(g.astype(jnp.float32))
            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        _ = float(np.asarray(bench(feats, flat_idx, 2)))  # compile + warm
        t0 = time.perf_counter()
        _ = float(np.asarray(bench(feats, flat_idx, args.n)))
        dt = (time.perf_counter() - t0) / args.n
        rate[w] = probe_rows / dt
        print(f"width {w:4d} lanes: {dt * 1e3:7.2f} ms for {probe_rows} rows"
              f" -> {rate[w] / 1e6:6.1f} M rows/s"
              f" ({probe_rows * w * 2 / dt / 1e9:6.1f} GB/s)", file=sys.stderr)

    floor_s = sum(r / rate[w] for w, r in rows.items())
    result = {
        "experiment": "gather_speed_of_light",
        "batch": BATCH,
        "gather_rows_per_step": total_rows,
        "rows_by_width": {str(w): int(r) for w, r in sorted(rows.items())},
        "rate_M_rows_per_s_by_width": {str(w): round(rate[w] / 1e6, 1)
                                       for w in sorted(rate)},
        "gather_floor_ms": round(floor_s * 1e3, 1),
        "max_scans_per_s_if_gather_only": round(BATCH / floor_s, 2),
        "note": ("floor = step time if XLA row gathers were the ONLY cost; "
                 "compare with the measured full-step time in BASELINE.md"),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
