"""Pallas 3x3/s1 conv kernel vs lax.conv_general_dilated (interpret mode).

The kernel was the round-4 verdict's named experiment and measured slower
than XLA on every raced shape (BASELINE.md round 5) — it stays in-tree as
the working refutation; these tests pin its math — forward, dgrad, wgrad —
to XLA's reference convolution on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objectdetectionpl_tpu.ops.pallas.conv_kernel import (
    conv3x3_s1, conv3x3_s1_op, conv3x3_s1_wgrad)


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("B,H,C,Co,group", [
    (2, 8, 8, 16, 1),
    (4, 6, 16, 8, 2),
    (2, 5, 4, 4, 1),     # odd spatial
])
def test_forward_matches_xla(B, H, C, Co, group):
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, H, H, C), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, Co),
                          jnp.float32) * 0.1
    got = conv3x3_s1(x, w, group=group, interpret=True)
    want = xla_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_vjp_matches_xla():
    B, H, C, Co = 2, 6, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, H, C), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, Co),
                          jnp.float32) * 0.1
    ct = jax.random.normal(jax.random.PRNGKey(2), (B, H, H, Co), jnp.float32)

    def loss_p(f):
        def fn(x, w):
            return jnp.vdot(f(x, w), ct)
        return fn

    gx, gw = jax.grad(loss_p(conv3x3_s1_op), argnums=(0, 1))(x, w)
    ex, ew = jax.grad(loss_p(xla_conv), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ex),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(ew),
                               rtol=1e-4, atol=1e-4)


def test_wgrad_grouped_accumulation():
    """group>1 and the multi-step grid accumulate identically."""
    B, H, C, Co = 4, 4, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(3), (B, H, H, C), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(4), (B, H, H, Co), jnp.float32)
    a = conv3x3_s1_wgrad(x, g, group=1, interpret=True)
    b = conv3x3_s1_wgrad(x, g, group=4, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_bf16_inputs_f32_accum():
    B, H, C, Co = 2, 8, 16, 16
    x = jax.random.normal(jax.random.PRNGKey(5), (B, H, H, C)).astype(
        jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(6), (3, 3, C, Co)) * 0.1
         ).astype(jnp.bfloat16)
    got = conv3x3_s1(x, w, group=2, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = xla_conv(x.astype(jnp.float32), w.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want), rtol=5e-2, atol=5e-2)


def test_row_strip_split_matches_xla(monkeypatch):
    """Large-spatial inputs split into halo'd row strips (the 320x320 stem's
    full-image patch temp is 22 MB > the 16 MB scoped-VMEM limit).  Force a
    tiny budget so a CPU-sized input exercises the strip path, fwd + vjp."""
    from objectdetectionpl_tpu.ops.pallas import conv_kernel as ck
    monkeypatch.setattr(ck, "_PATCH_BUDGET", 4096)
    B, H, C, Co = 2, 12, 4, 8
    assert ck._pick_strips(H, H, C) > 1
    x = jax.random.normal(jax.random.PRNGKey(2), (B, H, H, C), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, C, Co),
                          jnp.float32) * 0.1
    got = ck.conv3x3_s1(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(xla_conv(x, w)),
                               rtol=1e-5, atol=1e-5)
    g = jax.random.normal(jax.random.PRNGKey(4), (B, H, H, Co), jnp.float32)
    dw = ck.conv3x3_s1_wgrad(x, g, interpret=True)
    _, vjp = jax.vjp(lambda w_: xla_conv(x, w_), w)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(vjp(g)[0]),
                               rtol=1e-4, atol=1e-4)
