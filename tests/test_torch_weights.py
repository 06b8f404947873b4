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
