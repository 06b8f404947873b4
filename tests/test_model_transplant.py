"""Full-model forward parity by weight transplant.

The strongest architecture-parity proof available without datasets: build the
reference torch models (model/SSD.py, model/YOLOV2.py) with random weights on
CPU, transplant every parameter into our flax models, and assert the complete
forwards agree elementwise.

The reference model modules hard-code CUDA, torchvision, pytorch_lightning and
a CWD-relative palette pickle; the ``ref_models`` fixture stubs exactly those
environment dependencies (never the model code itself).
"""

import pickle
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def ref_models(reference_path):
    """Import the reference model package on CPU with stubbed externals."""
    import torch
    import torch.nn as nn

    # --- CUDA aliases (the models call .cuda() at init) --------------------
    torch.cuda.FloatTensor = torch.FloatTensor
    torch.cuda.LongTensor = torch.LongTensor
    torch.cuda.ByteTensor = torch.ByteTensor
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    # --- pytorch_lightning stub (models subclass pl.LightningModule) -------
    pl_stub = types.ModuleType("pytorch_lightning")
    pl_stub.LightningModule = nn.Module
    sys.modules.setdefault("pytorch_lightning", pl_stub)

    # --- torchinfo stub (lightningUtils.saveDetail only) --------------------
    ti_stub = types.ModuleType("torchinfo")
    ti_stub.summary = lambda *a, **k: None
    sys.modules.setdefault("torchinfo", ti_stub)

    # --- torchvision stub: vgg16().features with torchvision's layer layout --
    def _vgg16_features():
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, in_c = [], 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(in_c, v, 3, padding=1))
                layers.append(nn.ReLU(inplace=True))
                in_c = v
        return nn.Sequential(*layers)

    def _vgg16(pretrained=False, **kw):
        m = types.SimpleNamespace()
        m.features = _vgg16_features()
        return m

    tv_stub = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_models.vgg16 = _vgg16
    tv_stub.models = tv_models
    sys.modules.setdefault("torchvision", tv_stub)
    sys.modules.setdefault("torchvision.models", tv_models)

    # py3.12 compat: the reference does `from collections import Iterable`
    # (model/YOLOV3.py:3), an alias removed from the stdlib in 3.10
    import collections
    import collections.abc
    for _name in ("Iterable", "Mapping", "Sequence", "Callable"):
        if not hasattr(collections, _name):
            setattr(collections, _name, getattr(collections.abc, _name))

    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)

    # palette pickle is opened CWD-relative at class scope
    import os
    cwd = os.getcwd()
    os.chdir(reference_path)
    try:
        import importlib
        ssd_mod = importlib.import_module("model.SSD")
        yolov2_mod = importlib.import_module("model.YOLOV2")
        yolov3_mod = importlib.import_module("model.YOLOV3")
        yolov4_mod = importlib.import_module("model.YOLOV4")
        yolov5_mod = importlib.import_module("model.YOLOV5")
        retina_mod = importlib.import_module("model.RetinaNet")
    finally:
        os.chdir(cwd)
    return types.SimpleNamespace(
        SSD=ssd_mod.SSD, YOLOv2=yolov2_mod.YOLOv2, YOLOv3=yolov3_mod.YOLOv3,
        YOLOv4=yolov4_mod.YOLOv4, YOLOv5=yolov5_mod.YOLOv5,
        RetinaNet=retina_mod.RetinaNet)


def _randomize_bn_stats(ref, seed=7):
    """Randomize BN running stats so eval-mode parity actually tests them."""
    import torch
    sd = ref.state_dict()
    gen = torch.Generator().manual_seed(seed)
    for k, v in sd.items():
        if k.endswith("running_mean"):
            v.copy_(torch.randn(v.shape, generator=gen) * 0.1)
        elif k.endswith("running_var"):
            v.copy_(1.0 + 0.1 * torch.rand(v.shape, generator=gen))


def _ref_args(model_name, cls_criterion="ce_loss"):
    # RetinaNet must use focal_loss: its loss factory calls
    # cls_criterion(num_classes, ...) which only focal_loss accepts
    # (losses.py:357 "only focal")
    return types.SimpleNamespace(
        model_name=model_name, cls_criterion=cls_criterion,
        coord_criterion="smooth_l1_loss", data_module="TEST",
        type="Yolov5s")


def _state_dict_np(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def test_ssd_forward_transplant_parity(ref_models):
    """Reference SSD (model/SSD.py:179-223) vs our flax SSD under identical
    weights: (loc, cls) agree elementwise on a full 300x300 forward."""
    import torch
    from objectdetectionpl_tpu.models.ssd import SSD
    from objectdetectionpl_tpu.utils import torch_weights

    C_ref = 4                       # ref class channels (= our 1 + C)
    ref = ref_models.SSD(classes=[str(i) for i in range(C_ref)],
                         args=_ref_args("SSD"))
    ref.eval()

    model = SSD(num_classes=C_ref - 1)
    x = np.random.RandomState(0).rand(1, 300, 300, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params, n = torch_weights.load_reference_ssd(
        variables["params"], _state_dict_np(ref))
    assert n == 35                  # 13 vgg + 10 extras + 12 heads

    loc, cls = model.apply({"params": params}, jnp.asarray(x), train=False)
    with torch.no_grad():
        ref_loc, ref_cls = ref(torch.tensor(x.transpose(0, 3, 1, 2)))

    np.testing.assert_allclose(np.asarray(loc), ref_loc.numpy(),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(cls), ref_cls.numpy(),
                               rtol=1e-4, atol=1e-3)


def test_yolov2_forward_transplant_parity(ref_models):
    """Reference YOLOv2 (model/YOLOV2.py:121-157) vs our flax YOLOv2 (darknet
    reorg mode) under identical weights: full head map agrees elementwise."""
    import torch
    from objectdetectionpl_tpu.models.yolov2 import YOLOv2
    from objectdetectionpl_tpu.utils import torch_weights

    C = 3
    ref = ref_models.YOLOv2(classes=[str(i) for i in range(C)],
                            args=_ref_args("YOLOv2"))
    ref.eval()
    _randomize_bn_stats(ref)

    model = YOLOv2(num_classes=C, reorg="darknet")
    x = np.random.RandomState(1).rand(1, 416, 416, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params, batch_stats, n = torch_weights.load_reference_yolov2(
        variables["params"], variables["batch_stats"], _state_dict_np(ref))
    assert n == 23                  # 13 + 7 + passthrough + fuse + detect

    out = model.apply({"params": params, "batch_stats": batch_stats},
                      jnp.asarray(x), train=False)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x.transpose(0, 3, 1, 2)))

    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=1e-4, atol=1e-3)


def test_yolov5_forward_transplant_parity(ref_models):
    """Reference YOLOv5s (model/YOLOV5.py:104-155: backbone_head seq0-21 +
    Yolo_Layers reshape) vs our flax YOLOv5 under identical weights: all 3
    scale maps agree elementwise (incl. the Focus phase-block permutation)."""
    import torch
    from objectdetectionpl_tpu.models.yolov5 import YOLOv5
    from objectdetectionpl_tpu.utils import torch_weights

    C = 3
    ref = ref_models.YOLOv5(classes=[str(i) for i in range(C)],
                            args=_ref_args("YOLOv5"))
    ref.eval()
    _randomize_bn_stats(ref)

    model = YOLOv5(num_classes=C, variant="Yolov5s")
    x = np.random.RandomState(3).rand(1, 320, 320, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params, batch_stats, n = torch_weights.load_reference_yolov5(
        variables["params"], variables["batch_stats"], _state_dict_np(ref))
    assert n == 60          # 45 ConvBN pairs + 12 CSP plain cv2/cv3 + 3 heads

    out = model.apply({"params": params, "batch_stats": batch_stats},
                      jnp.asarray(x), train=False)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x.transpose(0, 3, 1, 2)))

    assert len(out) == len(ref_out) == 3
    for ours, theirs in zip(out, ref_out):
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   rtol=1e-4, atol=1e-3)


def test_yolov3_forward_transplant_parity(ref_models):
    """Reference YOLOv3 (model/YOLOV3.py:254-271: Darknet53 extractor with
    k/s_residual taps + 5 detector sequences) vs our flax YOLOv3 under
    identical weights: all 3 raw NCHW maps agree elementwise."""
    import torch
    from objectdetectionpl_tpu.models.yolov3 import YOLOv3
    from objectdetectionpl_tpu.utils import torch_weights

    C = 3
    ref = ref_models.YOLOv3(classes=[str(i) for i in range(C)],
                            args=_ref_args("YOLOv3"))
    ref.eval()
    _randomize_bn_stats(ref)

    model = YOLOv3(num_classes=C)
    x = np.random.RandomState(4).rand(1, 320, 320, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params, batch_stats, n = torch_weights.load_reference_yolov3(
        variables["params"], variables["batch_stats"], _state_dict_np(ref))
    assert n == 75          # 52 extractor + 3x(6+1) detector + 60/69

    out = model.apply({"params": params, "batch_stats": batch_stats},
                      jnp.asarray(x), train=False)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x.transpose(0, 3, 1, 2)))

    assert len(out) == len(ref_out) == 3
    for ours, theirs in zip(out, ref_out):
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   rtol=1e-4, atol=1e-3)


def test_yolov4_forward_transplant_parity(ref_models):
    """Reference YOLOv4 (model/YOLOV4.py:136-283: CSPDarknet53 down1-5 +
    SPP/PAN neck + PAN head) vs our flax YOLOv4 under identical weights:
    all 3 raw NCHW maps (strides 8/16/32) agree elementwise."""
    import torch
    from objectdetectionpl_tpu.models.yolov4 import YOLOv4
    from objectdetectionpl_tpu.utils import torch_weights

    C = 3
    ref = ref_models.YOLOv4(classes=[str(i) for i in range(C)],
                            args=_ref_args("YOLOv4"))
    ref.eval()
    _randomize_bn_stats(ref)

    model = YOLOv4(num_classes=C)
    x = np.random.RandomState(5).rand(1, 320, 320, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params, batch_stats, n = torch_weights.load_reference_yolov4(
        variables["params"], variables["batch_stats"], _state_dict_np(ref))
    assert n == 110         # 8 + 4 stages (5 conv + 2*nblocks) + 20 + 15 + 3

    out = model.apply({"params": params, "batch_stats": batch_stats},
                      jnp.asarray(x), train=False)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x.transpose(0, 3, 1, 2)))

    assert len(out) == len(ref_out) == 3
    for ours, theirs in zip(out, ref_out):
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   rtol=1e-4, atol=1e-3)


def test_retinanet_forward_transplant_parity(ref_models):
    """Reference RetinaNet (model/RetinaNet.py:90-101 + RetinaNetbone FPN)
    vs our flax RetinaNet under identical weights: (loc, cls) agree
    elementwise on a full forward."""
    import torch
    from objectdetectionpl_tpu.models.retinanet import RetinaNet
    from objectdetectionpl_tpu.utils import torch_weights

    C = 4
    ref = ref_models.RetinaNet(classes=[str(i) for i in range(C)],
                               args=_ref_args("RetinaNet",
                                              cls_criterion="focal_loss"))
    ref.eval()
    _randomize_bn_stats(ref)

    model = RetinaNet(num_classes=C)
    x = np.random.RandomState(6).rand(1, 320, 320, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params, batch_stats, n = torch_weights.load_reference_retinanet(
        variables["params"], variables["batch_stats"], _state_dict_np(ref))
    assert n == 70          # 53 conv+bn (stem + 16x3 + 4 downsample)
                            # + 7 fpn convs + 10 head convs

    loc, cls = model.apply({"params": params, "batch_stats": batch_stats},
                           jnp.asarray(x), train=False)
    with torch.no_grad():
        ref_loc, ref_cls = ref(torch.tensor(x.transpose(0, 3, 1, 2)))

    np.testing.assert_allclose(np.asarray(loc), ref_loc.numpy(),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(cls), ref_cls.numpy(),
                               rtol=1e-4, atol=1e-3)


def test_reorg_darknet_matches_reference_op():
    """blocks.reorg_darknet_bug reproduces the reference's 6-D view/permute
    passthrough (model/YOLOV2.py:144-151) exactly."""
    import torch
    from objectdetectionpl_tpu.nn.blocks import reorg_darknet_bug

    B, C, H, W = 2, 64, 26, 26
    x = np.random.RandomState(2).randn(B, C, H, W).astype(np.float32)
    t = torch.tensor(x)
    t = t.contiguous().view(B, C // 4, H, 2, W, 2).contiguous()
    t = t.permute(0, 3, 5, 1, 2, 4).contiguous()
    want = t.view(B, -1, H // 2, W // 2).numpy()

    got = reorg_darknet_bug(jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_array_equal(
        np.asarray(got).transpose(0, 3, 1, 2), want)
