"""Model shape-contract tests (trace-only via eval_shape — no XLA compile)
plus one tiny end-to-end train-step test."""

import numpy as np

import jax
import jax.numpy as jnp

from objectdetectionpl_tpu.models import build_model
from objectdetectionpl_tpu.ops import losses
from tests.conftest import make_padded_targets

C = 4  # small class count keeps channel sizes tiny


def _shapes(model, size, batch=1):
    """Trace init+apply without compiling or allocating."""
    x = jax.ShapeDtypeStruct((batch, size, size, 3), jnp.float32)
    variables = jax.eval_shape(lambda r, xx: model.init(r, xx, train=False),
                               jax.random.PRNGKey(0), x)
    out = jax.eval_shape(lambda v, xx: model.apply(v, xx, train=False),
                         variables, x)
    return out


def test_yolov2_contract():
    out = _shapes(build_model("YOLOv2", C), 416)
    assert out.shape == (1, 5 * (5 + C), 13, 13)


def test_yolov3_contract():
    out = _shapes(build_model("YOLOv3", C), 416)
    assert [o.shape for o in out] == [(1, 3 * (5 + C), g, g)
                                      for g in (13, 26, 52)]


def test_yolov4_contract():
    out = _shapes(build_model("YOLOv4", C), 416)
    assert [o.shape for o in out] == [(1, 3 * (5 + C), g, g)
                                      for g in (52, 26, 13)]


def test_yolov5_contract():
    out = _shapes(build_model("YOLOv5", C, yolov5_type="Yolov5s"), 640)
    assert [o.shape for o in out] == [(1, 3, g, g, 5 + C)
                                      for g in (80, 40, 20)]


def test_yolov5_variants_scale_params():
    """Width/depth multiples change parameter counts monotonically."""
    x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    counts = {}
    for v in ("Yolov5s", "Yolov5m"):
        m = build_model("YOLOv5", C, yolov5_type=v)
        var = jax.eval_shape(lambda r, xx, mm=m: mm.init(r, xx, train=False),
                             jax.random.PRNGKey(0), x)
        counts[v] = sum(int(np.prod(l.shape))
                        for l in jax.tree.leaves(var["params"]))
    assert counts["Yolov5m"] > counts["Yolov5s"]


def test_ssd_contract():
    out = _shapes(build_model("SSD", C), 300)
    loc, cls = out
    assert loc.shape == (1, 8732, 4)
    assert cls.shape == (1, 8732, 1 + C)


def test_ssd_bn_variant():
    """ssd_bn (DIVERGENCES #27): same output contract, BN stats on the 13
    VGG feature convs only (extras/heads stay BN-free like the reference)."""
    m = build_model("SSD", C, ssd_bn=True)
    x = jax.ShapeDtypeStruct((1, 300, 300, 3), jnp.float32)
    variables = jax.eval_shape(lambda r, xx: m.init(r, xx, train=False),
                               jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    n_bn = sum(1 for p in jax.tree_util.tree_leaves_with_path(
        variables["batch_stats"]) if "mean" in str(p[0]))
    assert n_bn == 13       # VGG16's 13 feature convs (10 in F1 + 3 in BASE1)
    loc, cls = jax.eval_shape(
        lambda v, xx: m.apply(v, xx, train=False), variables, x)
    assert loc.shape == (1, 8732, 4)
    assert cls.shape == (1, 8732, 1 + C)


def test_retinanet_contract():
    out = _shapes(build_model("RetinaNet", C), 256)
    loc, cls = out
    num_anchors = sum(int(np.ceil(256 / 2 ** (i + 3))) ** 2 * 9
                      for i in range(5))
    assert loc.shape == (1, num_anchors, 4)
    assert cls.shape == (1, num_anchors, C)


def test_yolov2_train_step_decreases_loss(rng):
    """End-to-end: forward + loss + SGD steps reduce the loss (tiny 160px)."""
    import optax

    model = build_model("YOLOv2", C)
    x = jnp.asarray(rng.rand(2, 160, 160, 3), jnp.float32)
    labels, boxes, mask = make_padded_targets(rng, 2, 5, C)
    labels, boxes, mask = jnp.asarray(labels), jnp.asarray(boxes), jnp.asarray(mask)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    loss_fn = losses.make_loss("YOLOv2", C, 160)

    def objective(p, bs):
        out, updates = model.apply({"params": p, "batch_stats": bs}, x,
                                   train=True, mutable=["batch_stats"])
        return loss_fn(out, labels, boxes, mask)["loss"], updates

    tx = optax.sgd(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, bs, s):
        (loss, updates), grads = jax.value_and_grad(objective, has_aux=True)(p, bs)
        up, s = tx.update(grads, s)
        return optax.apply_updates(p, up), updates["batch_stats"], s, loss

    losses_seen = []
    for _ in range(3):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)
        losses_seen.append(float(loss))
    assert losses_seen[-1] < losses_seen[0]
    assert all(np.isfinite(l) for l in losses_seen)


def test_batchnorm_bf16_moments_match_flax(rng):
    """ADVICE r2: our BatchNorm squares x in the compute dtype (bf16) before
    the f32-accumulated sum and uses E[x^2]-E[x]^2, vs flax's all-f32
    pipeline.  Bound the train-mode moment/output error at bf16 with
    decidedly non-zero-mean inputs (mean +-2, the worst realistic post-conv
    drift): batch stats within 1e-2 relative, normalized output within the
    bf16 quantum (~8e-3 for |y|<=2)."""
    from flax import linen as nn
    from objectdetectionpl_tpu.nn.blocks import BatchNorm

    x32 = jnp.asarray(rng.randn(8, 16, 16, 24) * 1.5
                      + rng.uniform(-2, 2, (1, 1, 1, 24)), jnp.float32)
    x16 = x32.astype(jnp.bfloat16)

    ours = BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                     dtype=jnp.bfloat16)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                       dtype=jnp.bfloat16)

    vo = ours.init(jax.random.PRNGKey(0), x16)
    vr = ref.init(jax.random.PRNGKey(0), x16)
    yo, so = ours.apply(vo, x16, mutable=["batch_stats"])
    yr, sr = ref.apply(vr, x16, mutable=["batch_stats"])

    mo, varo = so["batch_stats"]["mean"], so["batch_stats"]["var"]
    mr, varr = sr["batch_stats"]["mean"], sr["batch_stats"]["var"]
    # f32 ground truth BATCH moments of the bf16 tensor, pushed through the
    # running update (init mean 0 / var 1, momentum 0.9)
    xt = x16.astype(jnp.float32)
    m_true = 0.1 * xt.mean(axis=(0, 1, 2))
    v_true = 0.9 + 0.1 * ((xt - xt.mean(axis=(0, 1, 2))) ** 2).mean(
        axis=(0, 1, 2))

    np.testing.assert_allclose(np.asarray(mo), np.asarray(m_true),
                               rtol=1e-4, atol=1e-5)
    # E[x^2]-E[x]^2 cancellation at mean +-2, var ~2: benign at f32 accum
    np.testing.assert_allclose(np.asarray(varo), np.asarray(v_true),
                               rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(varo), np.asarray(varr),
                               rtol=1e-2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mo), np.asarray(mr),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(yo, np.float32), np.asarray(yr, np.float32),
        atol=3.3e-2)   # 1 bf16 ulp at the |y| ~ 4 tail of the normalized out


def test_ssd_vgg_stack_activation_scale(rng):
    """The no-BN VGG16 stack must hold activation variance through its 13
    ReLU convs (kaiming fan-out init, torchvision's own from-scratch VGG
    init).  Regression: flax's default lecun_normal decays variance ~2x per
    conv (~2^-13 by conv5_3) and the synthetic SSD learning run measured a
    hard stall at mAP 0.001/150 epochs (BASELINE.md round 3)."""
    from objectdetectionpl_tpu.models.ssd import _VGGStack, _VGG_F1

    stack = _VGGStack(tuple(_VGG_F1))
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    v = stack.init(jax.random.PRNGKey(0), x, train=False)
    y = stack.apply(v, x, train=False)
    # measured: kaiming 0.072 at conv4_3 on uniform[0,1] input; lecun decays
    # a further ~2^-6.5 to ~1e-3.  0.02 separates the two regimes robustly.
    assert float(jnp.std(y)) > 0.02


def test_fold_input_scale_exact(rng):
    """Serving fold: conv(x/255, W) == conv(x, W/255) through the whole
    YOLOv5 forward (utils/fuse.fold_input_scale; bench.py serving default)."""
    from objectdetectionpl_tpu.models import build_model
    from objectdetectionpl_tpu.utils.fuse import fold_input_scale

    m = build_model("YOLOv5", 3, yolov5_type="Yolov5s")
    x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    a = m.apply(v, x / 255.0, train=False)
    b = m.apply({**v, "params": fold_input_scale(v["params"], 1 / 255.0)},
                x, train=False)
    for ai, bi in zip(a, b):
        np.testing.assert_allclose(np.asarray(ai), np.asarray(bi),
                                   rtol=2e-5, atol=2e-5)


def test_space_to_depth_variants_bitequal(rng):
    """The transpose formulation (serving default) must bit-match the
    strided-slice formulation Focus/transplant parity was proven with."""
    from objectdetectionpl_tpu.nn.blocks import space_to_depth
    x = jnp.asarray(rng.rand(2, 8, 8, 3), jnp.float32)
    a = space_to_depth(x, 2, via="slices")
    b = space_to_depth(x, 2, via="transpose")
    assert bool((a == b).all())
