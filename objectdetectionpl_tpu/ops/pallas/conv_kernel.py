"""Pallas TPU kernels: 3x3 stride-1 SAME convolution (fwd + custom VJP).

The capability the reference gets from cuDNN (every ``Conv2dBatchReLU`` in
LightningFunc/utils/YoloV3Utils.py:158-197, the v5 ``Conv`` blocks in
YoloV5Utils.py:119-140), hand-scheduled in Pallas — built for the round-4
verdict's named experiment and **measured slower than XLA on every raced
shape** (0.28-0.83x, BASELINE.md round 5; the "XLA convs at 9-22% MFU"
premise was a 20-iteration dispatch-floor artifact — corrected isolated
MFU is 25-77%).  Kept in-tree as the working refutation: the structural
cost is the in-VMEM patch materialization (9x the input block in VPU
copies) that XLA's native conv avoids via halo reuse.  Not wired into any
production model.

Formulation ("9-slice"): a 3x3/s1 conv is nine shifted GEMMs

    Y[b, r, w, :] = sum_{dy, dx} X[b, r+dy-1, w+dx-1, :] @ W[dy, dx, :, :]

Each tap is a [H*W, C] x [C, Co] matmul on a *contiguous sublane-shifted
slice* of the padded input block — no im2col buffer, no gather.  The nine
accumulating GEMMs are exactly the block-row decomposition of the single
K=9C im2col GEMM, so MXU pass count is identical to a perfect im2col while
the patch-building cost is zero.  Utilization ceiling is
(C/ceil128(C)) * (Co/ceil128(Co)): ~100% for the 128/256-channel layers,
25% for C=64 — against XLA's measured 9-12% on the same shapes.

The backward reuses the same kernel: dX is a 3x3/s1 conv of dY with the
spatially-flipped, transposed kernel; dW is a per-tap [C, M] x [M, Co]
reduction streamed over the batch grid with a VMEM f32 accumulator.

Like every kernel in this package: interpret-mode on CPU (tests cover the
math), real Mosaic on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; interpret mode covers CPU test runs.
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _vmem_spec(shape, index_map):
    if _HAS_PLTPU:
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)
    return pl.BlockSpec(shape, index_map)


def _pick_group(B: int, per_image_bytes: int,
                budget: int = 8 * 1024 * 1024) -> int:
    """Images per grid step: fill ~8 MB of VMEM (half, for double buffering)."""
    g = max(1, budget // max(per_image_bytes, 1))
    while B % g:
        g -= 1
    return g


_PATCH_BUDGET = 6 * 1024 * 1024   # scoped-VMEM share for one strip's patches


def _pick_strips(H: int, W: int, C: int, budget: int = None) -> int:
    """Split H into `ns` row strips so one strip's [Sh*W, 9C] bf16 patch temp
    fits the scoped-VMEM budget (the 320x320 stem's full-image patch temp is
    22 MB — over the 16 MB limit on its own)."""
    if budget is None:
        budget = _PATCH_BUDGET
    ns = 1
    while ns < H and (H // ns) * W * 9 * C * 2 > budget:
        ns += 1
        while H % ns:
            ns += 1
    return ns


def _to_strips(xp, ns: int):
    """[B, H+2, W+2, C] padded input -> [B*ns, Sh+2, W+2, C] overlapping row
    strips (1-row halo each side); an HBM copy of ~(1 + 2/Sh) x the input."""
    B, Hp2, Wp2, C = xp.shape
    Sh = (Hp2 - 2) // ns
    strips = jnp.stack([xp[:, i * Sh:i * Sh + Sh + 2] for i in range(ns)], 1)
    return strips.reshape(B * ns, Sh + 2, Wp2, C)


# ---------------------------------------------------------------- forward


def _fwd_kernel(x_ref, w_ref, o_ref, *, G, H, W, C, Co, out_dtype):
    # x_ref [G, H+2, W+2, C], w_ref [9*C, Co], o_ref [G, H, W, Co].
    #
    # In-VMEM im2col: the nine sublane-shifted tap slices concatenate along
    # lanes (offsets t*C — 128-aligned for the v5s channel widths) into one
    # [H*W, 9C] patch block, so the whole conv is ONE matmul whose K-dim
    # accumulation happens inside the MXU.  (A 9-separate-dot variant
    # measured slower: each dot round-trips the [H*W, Co] f32 accumulator
    # through VMEM — 1.83 vs 1.61 ms XLA on 40x40x128; this form wins.)
    for g in range(G):
        patches = jnp.concatenate(
            [x_ref[g, dy:dy + H, dx:dx + W, :].reshape(H * W, C)
             for dy in range(3) for dx in range(3)], axis=1)
        acc = jax.lax.dot_general(
            patches, w_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[g] = acc.reshape(H, W, Co).astype(out_dtype)


def conv3x3_s1(x, w, *, group: int = None, interpret: bool = None):
    """3x3 stride-1 SAME conv, NHWC: x [B,H,W,C] @ w [3,3,C,Co] -> [B,H,W,Co].

    Raw forward (no VJP) — use :func:`conv3x3_s1_op` inside models.
    """
    if interpret is None:
        interpret = not _on_tpu()
    B, H, W, C = x.shape
    Co = w.shape[-1]
    w = w.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ns = _pick_strips(H, W, C)
    if ns > 1:
        xp = _to_strips(xp, ns)
        B, H = B * ns, H // ns
    if group is None:
        # per-image VMEM: blocked in/out buffers (double-buffered by Mosaic)
        # PLUS the in-kernel [H*W, 9C] patch temp — omitting the patch temp
        # OOMed scoped vmem at 80x80x64 (16.35M > 16M limit, measured).
        per_img = 2 * ((H + 2) * (W + 2) * C + H * W * Co + H * W * 9 * C)
        group = _pick_group(B, per_img, budget=8 * 1024 * 1024)
    G = group
    kern = functools.partial(_fwd_kernel, G=G, H=H, W=W, C=C, Co=Co,
                             out_dtype=x.dtype)
    flops = 2 * B * H * W * C * Co * 9
    out = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[
            _vmem_spec((G, H + 2, W + 2, C), lambda i: (i, 0, 0, 0)),
            _vmem_spec((9 * C, Co), lambda i: (0, 0)),
        ],
        out_specs=_vmem_spec((G, H, W, Co), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * (B * H * W * (C + Co)),
            transcendentals=0),
        interpret=interpret,
    )(xp, w.reshape(9 * C, Co))
    if ns > 1:
        out = out.reshape(B // ns, ns * H, W, Co)
    return out


# ---------------------------------------------------------------- wgrad


def _wgrad_kernel(x_ref, g_ref, o_ref, *, G, H, W, C, Co):
    # x_ref [G, H+2, W+2, C], g_ref [G, H, W, Co], o_ref [9*C, Co] f32
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    for g in range(G):
        patches = jnp.concatenate(
            [x_ref[g, dy:dy + H, dx:dx + W, :].reshape(H * W, C)
             for dy in range(3) for dx in range(3)], axis=1)
        o_ref[...] += jax.lax.dot_general(
            patches, g_ref[g].reshape(H * W, Co),
            (((0,), (0,)), ((), ())),   # contract rows: [9C, Co]
            preferred_element_type=jnp.float32)


def conv3x3_s1_wgrad(x, g, *, group: int = None, interpret: bool = None):
    """dL/dW for the 3x3/s1 conv: x [B,H,W,C], g [B,H,W,Co] -> [3,3,C,Co] f32.

    Streams the batch through a sequential grid, accumulating the nine
    [C, Co] tap gradients in a VMEM-resident output block (constant index
    map -> the block stays on-chip across grid steps).
    """
    if interpret is None:
        interpret = not _on_tpu()
    B, H, W, C = x.shape
    Co = g.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ns = _pick_strips(H, W, C)
    if ns > 1:
        xp = _to_strips(xp, ns)
        g = g.reshape(B * ns, H // ns, W, Co)
        B, H = B * ns, H // ns
    if group is None:
        per_img = 2 * ((H + 2) * (W + 2) * C + H * W * Co
                       + H * W * 9 * C)
        group = _pick_group(B, per_img)
    G = group
    kern = functools.partial(_wgrad_kernel, G=G, H=H, W=W, C=C, Co=Co)
    out = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[
            _vmem_spec((G, H + 2, W + 2, C), lambda i: (i, 0, 0, 0)),
            _vmem_spec((G, H, W, Co), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=_vmem_spec((9 * C, Co), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((9 * C, Co), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * Co * 9,
            bytes_accessed=2 * B * H * W * (C + Co),
            transcendentals=0),
        interpret=interpret,
    )(xp, g)
    return out.reshape(3, 3, C, Co)


# ---------------------------------------------------------------- custom VJP


def _rot_w(w):
    """dgrad kernel: flip both spatial taps, swap C<->Co."""
    return jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)


@jax.custom_vjp
def conv3x3_s1_op(x, w):
    """Differentiable 3x3/s1 SAME conv (Pallas fwd + Pallas bwd)."""
    return conv3x3_s1(x, w)


def _op_fwd(x, w):
    return conv3x3_s1(x, w), (x, w)


def _op_bwd(res, g):
    x, w = res
    g = g.astype(x.dtype)
    dx = conv3x3_s1(g, _rot_w(w).astype(x.dtype))
    dw = conv3x3_s1_wgrad(x, g).astype(w.dtype)
    return dx, dw


conv3x3_s1_op.defvjp(_op_fwd, _op_bwd)
