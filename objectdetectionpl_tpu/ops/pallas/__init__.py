"""Pallas TPU kernels for the hot, hand-schedulable ops.

The compute-heavy path (convs/matmuls) belongs to XLA; Pallas covers the ops
XLA schedules poorly — the inherently serial greedy NMS scan (kept entirely
in VMEM) and fused preprocessing.  Every kernel has an XLA fallback with
identical semantics; kernels run in interpret mode off-TPU so tests cover
them on CPU.
"""
