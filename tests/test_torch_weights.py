"""Weight-converter test: a torch VGG16 feature stack and our SSD backbone
produce the same conv4_3 features after conversion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _torch_vgg16_features():
    """Replicate torchvision vgg16.features layer indexing (config 'D')."""
    import torch.nn as nn
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
           "M", 512, 512, 512, "M"]
    layers = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            in_ch = v
    return nn.Sequential(*layers)


def test_vgg16_conversion_feature_parity(rng):
    import torch
    from objectdetectionpl_tpu.models import build_model
    from objectdetectionpl_tpu.utils.torch_weights import load_vgg16_into_ssd

    tnet = _torch_vgg16_features()
    sd = {f"features.{k}": v.detach().numpy()
          for k, v in tnet.state_dict().items()}

    model = build_model("SSD", 4)
    x = rng.rand(1, 300, 300, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    new_params, n = load_vgg16_into_ssd(variables["params"], sd)
    assert n == 13

    # run just the first VGG stack (conv4_3 features, 38x38x512)
    from objectdetectionpl_tpu.models.ssd import _VGGStack, _VGG_F1
    stack = _VGGStack(tuple(_VGG_F1))
    sub_params = new_params["_VGGStack_0"]
    ours = stack.apply({"params": sub_params}, jnp.asarray(x), train=False)

    with torch.no_grad():
        # conv4_3 = through torchvision features index 22 (ReLU after conv 21)
        t_in = torch.tensor(x.transpose(0, 3, 1, 2))
        theirs = t_in
        # emulate the reference's modified pool3 (ceil_mode=True, SSD.py:49)
        for i, layer in enumerate(list(tnet)[:23]):
            if i == 16:
                layer = torch.nn.MaxPool2d(2, ceil_mode=True)
            theirs = layer(theirs)
        theirs = theirs.numpy().transpose(0, 2, 3, 1)

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=1e-3)


def _torch_resnet50():
    """Minimal torchvision-naming-compatible ResNet50 trunk (conv1..layer4)."""
    import torch.nn as nn

    class Bottleneck(nn.Module):
        def __init__(self, inp, planes, stride=1):
            super().__init__()
            out = planes * 4
            self.conv1 = nn.Conv2d(inp, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, out, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(out)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = None
            if stride != 1 or inp != out:
                self.downsample = nn.Sequential(
                    nn.Conv2d(inp, out, 1, stride, bias=False),
                    nn.BatchNorm2d(out))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            h = self.relu(self.bn1(self.conv1(x)))
            h = self.relu(self.bn2(self.conv2(h)))
            h = self.bn3(self.conv3(h))
            return self.relu(h + idt)

    class Trunk(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            inp = 64
            for L, (planes, n, stride) in enumerate(
                    [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)],
                    start=1):
                blocks = []
                for i in range(n):
                    blocks.append(Bottleneck(inp, planes,
                                             stride if i == 0 else 1))
                    inp = planes * 4
                setattr(self, f"layer{L}", nn.Sequential(*blocks))

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            c2 = self.layer1(x)
            c3 = self.layer2(c2)
            c4 = self.layer3(c3)
            c5 = self.layer4(c4)
            return c5

    return Trunk()


def test_resnet50_conversion_feature_parity(rng):
    import torch
    from objectdetectionpl_tpu.models.retinanet import ResNetFPN
    from objectdetectionpl_tpu.utils.torch_weights import \
        load_resnet50_into_retinanet

    tnet = _torch_resnet50().eval()
    # randomize BN stats so running-average parity is actually exercised
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}

    model = ResNetFPN()
    x = rng.rand(1, 128, 128, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params, bstats, n = load_resnet50_into_retinanet(
        variables["params"], variables["batch_stats"], sd)
    assert n == 1 + 16 * 3 + 4          # stem + 48 convs + 4 downsamples

    # compare c5 (the deepest trunk feature both sides share)
    import flax
    with torch.no_grad():
        t_c5 = tnet(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    t_c5 = t_c5.transpose(0, 2, 3, 1)

    _, state = model.apply({"params": params, "batch_stats": bstats},
                           jnp.asarray(x), train=False,
                           capture_intermediates=True, mutable=["intermediates"])
    inter = flax.traverse_util.flatten_dict(
        state["intermediates"], sep="/")
    c5 = np.asarray(inter["Bottleneck_15/__call__"][0])
    np.testing.assert_allclose(c5, t_c5, rtol=1e-2, atol=1e-2)


def test_torch_ckpt_config_wiring(tmp_path):
    """config.torch_ckpt -> Trainer restores converted weights at state
    creation (the model/SSD.py:46 pretrained-VGG16 analogue, CLI-reachable)."""
    import torch
    import flax
    from objectdetectionpl_tpu.config import Config
    from objectdetectionpl_tpu.train.loop import Trainer

    feats = _torch_vgg16_features()
    ckpt = tmp_path / "vgg16.pth"
    torch.save({f"features.{k}": v for k, v in feats.state_dict().items()},
               str(ckpt))

    cfg = Config(data_module="Synthetic", synthetic_size=4, batch_size=1,
                 model_name="SSD", img_size=300, max_boxes=8,
                 log_dir=str(tmp_path / "log"), torch_ckpt=str(ckpt),
                 mesh_shape=(1, 1))
    t = Trainer(cfg)

    flat = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(t.state.params), sep="/")
    got = np.asarray(flat["_VGGStack_0/ConvBN_0/Conv_0/kernel"])
    want = feats[0].weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_load_torch_checkpoint_routing():
    """Key-signature routing picks the right converter per model."""
    from objectdetectionpl_tpu.utils.torch_weights import load_torch_checkpoint
    with pytest.raises(ValueError):
        load_torch_checkpoint("YOLOv5", {}, {}, {"x": np.zeros(1)})
