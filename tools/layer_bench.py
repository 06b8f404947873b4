"""Per-layer conv timing for the YOLOv5s-640 inventory on the real chip.

Times every unique conv shape of the v5s forward (ConvBN+leaky, bf16) alone
— forward and fwd+bwd — with the forced-barrier fori_loop methodology
(CLAUDE.md), then prints a roofline table: measured vs MXU bound
(flops / 197 TF/s) vs HBM bound (min traffic / 819 GB/s) and the implied
MXU efficiency.  Summing count-weighted rows approximates the whole model
and names the layers that carry the measured-vs-ideal gap (VERDICT r3
items 1 and 7).

ROUND-5 CORRECTION: the round-4 runs used --iters 20, so every row carried
the ~30 ms tunnel dispatch+fetch round trip / 20 = ~1.5 ms of floor — the
source of the "9-22% MFU" table and its "~2.5 ms isolated floor" caveat in
BASELINE.md.  At --iters 200 the same shapes measure 50-75% MFU: XLA's conv
codegen was never the training bottleneck.  Default raised accordingly.

Usage: python tools/layer_bench.py [--batch 128] [--iters 200] [--fwd-only]
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

# (H, Cin, Cout, k, stride) x count — the complete v5s-640 conv inventory
# (models/yolov5.py at width 0.5 / depth 0.33; W == H everywhere)
INVENTORY = [
    ((320, 12, 32, 3, 1), 1),     # Focus stem
    ((320, 32, 64, 3, 2), 1),     # ConvBN_0
    ((160, 64, 32, 1, 1), 1),     # BottleneckV5_0.cv1
    ((160, 32, 64, 3, 1), 1),     # BottleneckV5_0.cv2
    ((160, 64, 128, 3, 2), 1),    # ConvBN_1
    ((80, 128, 64, 1, 1), 2),     # CSP0 cv1 + y2
    ((80, 64, 64, 1, 1), 4),      # CSP0 3x bneck.cv1 + y1
    ((80, 64, 64, 3, 1), 3),      # CSP0 3x bneck.cv2
    ((80, 128, 128, 1, 1), 1),    # CSP0 cv3
    ((80, 128, 256, 3, 2), 1),    # ConvBN_2
    ((40, 256, 128, 1, 1), 2),    # CSP1 cv1 + y2
    ((40, 128, 128, 1, 1), 4),    # CSP1 bneck.cv1 x3 + y1
    ((40, 128, 128, 3, 1), 3),    # CSP1 bneck.cv2 x3
    ((40, 256, 256, 1, 1), 1),    # CSP1 cv3
    ((40, 256, 512, 3, 2), 1),    # ConvBN_3
    ((20, 512, 256, 1, 1), 1),    # SPP cv1
    ((20, 1024, 512, 1, 1), 1),   # SPP cv2
    ((20, 512, 256, 1, 1), 4),    # CSP2/CSP3 cv1 + y2 (2 each)
    ((20, 256, 256, 1, 1), 5),    # CSP2 (2 bneck cv1 + y1) + CSP3 (1+1)
    ((20, 256, 256, 3, 1), 3),    # CSP2 bneck.cv2 x2 + CSP3 x1
    ((20, 512, 512, 1, 1), 2),    # CSP2/CSP3 cv3
    ((20, 512, 45, 1, 1), 1),     # head stride-32
    ((40, 768, 256, 1, 1), 1),    # ConvBN_4
    ((40, 128, 128, 1, 1), 2),    # CSP4 bneck.cv1 + y1  (dup shape, extra)
    ((40, 128, 128, 3, 1), 1),    # CSP4 bneck.cv2
    ((40, 256, 256, 1, 1), 1),    # CSP4 cv3
    ((40, 256, 45, 1, 1), 1),     # head stride-16
    ((80, 384, 128, 1, 1), 1),    # ConvBN_5
    ((80, 128, 128, 1, 1), 1),    # CSP5 cv3
    ((80, 128, 45, 1, 1), 1),     # head stride-8
]

PEAK_TF = 197e12
PEAK_BW = 819e9


def bench_shape(B, H, Cin, Cout, k, s, iters, grad, serving=False):
    from objectdetectionpl_tpu.nn.blocks import ConvBN
    # serving: the exported graph folds BN into the conv (utils/fuse), so
    # the per-layer unit is conv+bias+SiLU in eval mode — no stats pass.
    m = ConvBN(Cout, k, stride=s, act="silu" if serving else "leaky",
               use_bn=not serving, dtype=jnp.bfloat16)
    x0 = jnp.zeros((B, H, H, Cin), jnp.bfloat16)
    variables = m.init(jax.random.PRNGKey(0), x0, train=not serving)
    params = variables["params"]

    def fwd(p, x):
        if serving:
            return m.apply({"params": p}, x,
                           train=False).astype(jnp.float32).sum()
        out, _ = m.apply({"params": p, **{k2: v for k2, v in
                                          variables.items()
                                          if k2 != "params"}},
                         x, train=True, mutable=["batch_stats"])
        return out.astype(jnp.float32).sum()

    f = jax.value_and_grad(fwd, argnums=(0, 1)) if grad else fwd

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(p, x, n):
        def body(_, acc):
            xi = x + (acc % 2).astype(x.dtype) * 1e-3
            if grad:
                v, (gp, gx) = f(p, xi)
                # fold the gradients into the carry so XLA cannot
                # dead-code-eliminate the backward pass
                v = (v + gx.astype(jnp.float32).sum()
                     + sum(g.astype(jnp.float32).sum()
                           for g in jax.tree.leaves(gp)))
            else:
                v = f(p, xi)
            return acc + v
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    x = jnp.asarray(np.random.RandomState(0).rand(B, H, H, Cin) - 0.5,
                    jnp.bfloat16)
    float(loop(params, x, iters))        # compile + warm
    best = float("inf")
    for _ in range(3):                   # min-of-3: rejects chip contention
        t0 = time.perf_counter()
        float(loop(params, x, iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--fwd-only", action="store_true")
    p.add_argument("--subset", action="store_true",
                   help="only the 8 shapes carrying ~70%% of conv flops "
                        "(remote compiles cost ~15 min per program)")
    p.add_argument("--serving", action="store_true",
                   help="eval-mode fused layers (conv+bias+SiLU, no BN "
                        "stats pass): the serving forward's per-layer unit; "
                        "implies --fwd-only")
    args = p.parse_args()
    if args.serving:
        args.fwd_only = True
    B = args.batch

    uniq = {}
    for shape, count in INVENTORY:
        uniq[shape] = uniq.get(shape, 0) + count
    if args.subset:
        keep = {(320, 12, 32, 3, 1), (320, 32, 64, 3, 2),
                (160, 64, 128, 3, 2), (80, 64, 64, 3, 1),
                (80, 128, 256, 3, 2), (40, 128, 128, 3, 1),
                (40, 256, 512, 3, 2), (20, 256, 256, 3, 1)}
        uniq = {k: v for k, v in uniq.items() if k in keep}

    rows = []
    for (H, Cin, Cout, k, s), count in uniq.items():
        Ho = H // s
        fl = 2.0 * B * Ho * Ho * Cin * Cout * k * k
        # min traffic: read in + write out (+ kernel, negligible)
        by = 2 * (B * H * H * Cin + B * Ho * Ho * Cout)
        t_mxu = fl / PEAK_TF
        t_hbm = by / PEAK_BW
        t_f = bench_shape(B, H, Cin, Cout, k, s, args.iters, grad=False,
                          serving=args.serving)
        t_g = (None if args.fwd_only else
               bench_shape(B, H, Cin, Cout, k, s, args.iters, grad=True))
        rows.append({
            "shape": f"{H}x{H} {Cin}->{Cout} k{k}s{s}", "count": count,
            "GF": fl / 1e9, "fwd_ms": t_f * 1e3,
            "fwdbwd_ms": None if t_g is None else t_g * 1e3,
            "mxu_ms": t_mxu * 1e3, "hbm_ms": t_hbm * 1e3,
            "mfu_pct": fl / PEAK_TF / t_f * 100,
        })
        print(json.dumps({k2: (round(v, 3) if isinstance(v, float) else v)
                          for k2, v in rows[-1].items()}), flush=True)

    tot_f = sum(r["fwd_ms"] * r["count"] for r in rows)
    tot_g = (None if args.fwd_only else
             sum(r["fwdbwd_ms"] * r["count"] for r in rows))
    tot_mxu = sum(r["mxu_ms"] * r["count"] for r in rows)
    tot_hbm = sum(r["hbm_ms"] * r["count"] for r in rows)
    print(f"\nSUM fwd {tot_f:.2f} ms"
          + ("" if tot_g is None else f"   fwd+bwd {tot_g:.2f} ms")
          + f"   MXU bound {tot_mxu:.2f} ms   HBM bound {tot_hbm:.2f} ms")
    print("top gap layers (count-weighted fwd measured - bound):")
    for r in sorted(rows, key=lambda r: -(r["fwd_ms"] - max(r["mxu_ms"],
                                                            r["hbm_ms"]))
                    * r["count"])[:5]:
        print(f"  {r['shape']} x{r['count']}: fwd {r['fwd_ms']:.3f} ms vs "
              f"bound {max(r['mxu_ms'], r['hbm_ms']):.3f} ms "
              f"(MFU {r['mfu_pct']:.0f}%)")


if __name__ == "__main__":
    main()
