"""A/B: Pallas 9-slice conv3x3/s1 kernel vs XLA's conv, on the real chip.

The round-4 verdict's named experiment (VERDICT item 1): XLA's isolated k3/s1
convs measure 9-12% MFU on the v5s channel geometry; this times the
hand-scheduled Pallas formulation against XLA on the same shapes with the
same forced-barrier fori_loop methodology (CLAUDE.md) so the comparison is
floor-for-floor fair.

Usage:
  python tools/pallas_conv_bench.py --shape 80,64,64 [--batch 128]
      [--iters 20] [--grad] [--impl both|xla|pallas] [--group N]

One shape per invocation keeps each remote-compiled program small
(CLAUDE.md: the compile service rejects very large programs).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

PEAK_TF = 197e12
PEAK_BW = 819e9


def xla_conv(x, w):
    # pure-bf16 signature so the VJP's transposed convs keep matching dtypes
    # (preferred_element_type=f32 leaks an f32 cotangent into the transpose
    # rule and conv_general_dilated rejects mixed dtypes); TPU bf16 convs
    # accumulate in f32 inside the MXU regardless.
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def bench(fn, w, x, iters, grad):
    if grad:
        def scalar(w_, x_):
            return fn(x_, w_).astype(jnp.float32).sum()
        f = jax.value_and_grad(scalar, argnums=(0, 1))
    else:
        f = None

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(w_, x_, n):
        def body(_, acc):
            xi = x_ + (acc % 2).astype(x_.dtype) * 1e-3
            if grad:
                v, (gw, gx) = f(w_, xi)
                v = (v + gx.astype(jnp.float32).sum()
                     + gw.astype(jnp.float32).sum())
            else:
                v = fn(xi, w_).astype(jnp.float32).sum()
            return acc + v
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(loop(w, x, iters))            # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(w, x, iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", required=True,
                   help="H,Cin,Cout (stride-1 3x3, W == H)")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--grad", action="store_true")
    p.add_argument("--impl", default="both",
                   choices=["both", "xla", "pallas"])
    p.add_argument("--group", type=int, default=None)
    args = p.parse_args()
    H, C, Co = (int(v) for v in args.shape.split(","))
    B = args.batch

    from objectdetectionpl_tpu.ops.pallas.conv_kernel import (
        conv3x3_s1, conv3x3_s1_op)

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(B, H, H, C) - 0.5, jnp.bfloat16)
    w = jnp.asarray(rs.rand(3, 3, C, Co) * 0.1 - 0.05, jnp.bfloat16)

    fl = 2.0 * B * H * H * C * Co * 9 * (3.0 if args.grad else 1.0)
    by = 2 * B * H * H * (C + Co) * (2.0 if args.grad else 1.0)
    out = {"shape": f"{H}x{H} {C}->{Co} k3s1", "batch": B,
           "grad": args.grad,
           "mxu_ms": fl / PEAK_TF * 1e3, "hbm_ms": by / PEAK_BW * 1e3}

    if args.impl in ("both", "xla"):
        t = bench(xla_conv, w, x, args.iters, args.grad)
        out["xla_ms"] = t * 1e3
        out["xla_mfu_pct"] = fl / PEAK_TF / t * 100
    if args.impl in ("both", "pallas"):
        if args.grad:
            pfn = conv3x3_s1_op
        else:
            pfn = functools.partial(conv3x3_s1, group=args.group)
        t = bench(pfn, w, x, args.iters, args.grad)
        out["pallas_ms"] = t * 1e3
        out["pallas_mfu_pct"] = fl / PEAK_TF / t * 100
    if "xla_ms" in out and "pallas_ms" in out:
        out["speedup"] = out["xla_ms"] / out["pallas_ms"]
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}), flush=True)


if __name__ == "__main__":
    main()
