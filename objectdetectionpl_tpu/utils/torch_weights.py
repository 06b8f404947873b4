"""torch -> flax weight conversion for pretrained backbones.

The reference initializes SSD from torchvision's pretrained VGG16
(model/SSD.py:46 ``vgg16(pretrained=True)``).  This environment has no
torchvision / no egress, so backbones default to from-scratch training; this
module provides the conversion path for when a torch checkpoint (state_dict)
IS available, so pretrained-weight capability survives the port.

Conventions: torch conv [O, I, kh, kw] -> flax kernel [kh, kw, I, O]; linear
[O, I] -> [I, O]; BatchNorm weight/bias -> scale/bias, running stats ->
batch_stats.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# torchvision vgg16.features conv layer indices ('D' config).
VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def conv_to_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def load_vgg16_into_ssd(params, state_dict: Dict[str, np.ndarray]):
    """Copy torchvision vgg16.features weights into SSD's VGG stacks.

    params: the SSD model's flax params (mutated copy returned).
    state_dict: torch state_dict with ``features.<i>.weight/bias`` keys
    (a full torchvision vgg16 state_dict also works).

    Our SSD splits VGG into _VGGStack_0 (10 convs, through conv4_3) and
    _VGGStack_1 (3 convs, conv5_x) — see models/ssd.py; each conv lives in a
    ``ConvBN_<j>`` submodule holding a single ``Conv_0``.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(params), sep="/")
    prefix = "features."
    sd = {k[len(prefix):] if k.startswith(prefix) else k: v
          for k, v in state_dict.items()}

    stacks = [("_VGGStack_0", VGG16_CONV_IDX[:10]),
              ("_VGGStack_1", VGG16_CONV_IDX[10:])]
    n_loaded = 0
    for stack_name, conv_ids in stacks:
        for j, ti in enumerate(conv_ids):
            w = sd.get(f"{ti}.weight")
            b = sd.get(f"{ti}.bias")
            if w is None:
                continue
            key_w = f"{stack_name}/ConvBN_{j}/Conv_0/kernel"
            key_b = f"{stack_name}/ConvBN_{j}/Conv_0/bias"
            if key_w not in flat:
                raise KeyError(f"flax param {key_w} not found; "
                               f"have {sorted(k for k in flat if stack_name in k)[:5]}")
            assert flat[key_w].shape == conv_to_flax(w).shape, (
                key_w, flat[key_w].shape, w.shape)
            flat[key_w] = conv_to_flax(w)
            if b is not None and key_b in flat:
                flat[key_b] = np.asarray(b)
            n_loaded += 1
    return (flax.core.freeze(flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in flat.items()})), n_loaded)


RESNET50_BLOCKS = [3, 4, 6, 3]


def load_resnet50_into_retinanet(params, batch_stats,
                                 state_dict: Dict[str, np.ndarray]):
    """Copy torchvision resnet50 weights into RetinaNet's ResNetFPN.

    Maps conv1/bn1 -> ResNetFPN_0/ConvBN_0, layer{L}.{i} ->
    Bottleneck_{offset+i} with conv1..3 -> ConvBN_0..2 and
    downsample.(0 conv, 1 bn) -> ConvBN_3.  BN running stats land in
    batch_stats.  Returns (params, batch_stats, n_loaded).
    """
    import flax

    fp = flax.traverse_util.flatten_dict(flax.core.unfreeze(params), sep="/")
    fb = flax.traverse_util.flatten_dict(flax.core.unfreeze(batch_stats),
                                         sep="/")
    # the FPN submodule name inside RetinaNet (absent if params are the FPN's)
    prefix = ("ResNetFPN_0/" if any(k.startswith("ResNetFPN_0/") for k in fp)
              else "")
    n = 0

    def put(flax_base: str, conv_key: str, bn_key: str = None):
        nonlocal n
        w = state_dict.get(f"{conv_key}.weight")
        if w is None:
            return
        kw = f"{prefix}{flax_base}/Conv_0/kernel"
        assert fp[kw].shape == conv_to_flax(w).shape, (kw, fp[kw].shape,
                                                       w.shape)
        fp[kw] = conv_to_flax(w)
        n += 1
        if bn_key is None:
            return
        fp[f"{prefix}{flax_base}/BatchNorm_0/scale"] = np.asarray(
            state_dict[f"{bn_key}.weight"])
        fp[f"{prefix}{flax_base}/BatchNorm_0/bias"] = np.asarray(
            state_dict[f"{bn_key}.bias"])
        fb[f"{prefix}{flax_base}/BatchNorm_0/mean"] = np.asarray(
            state_dict[f"{bn_key}.running_mean"])
        fb[f"{prefix}{flax_base}/BatchNorm_0/var"] = np.asarray(
            state_dict[f"{bn_key}.running_var"])

    put("ConvBN_0", "conv1", "bn1")
    block = 0
    for L, n_blocks in enumerate(RESNET50_BLOCKS, start=1):
        for i in range(n_blocks):
            base = f"Bottleneck_{block}"
            for c in range(1, 4):
                put(f"{base}/ConvBN_{c - 1}", f"layer{L}.{i}.conv{c}",
                    f"layer{L}.{i}.bn{c}")
            if f"layer{L}.{i}.downsample.0.weight" in state_dict:
                put(f"{base}/ConvBN_3", f"layer{L}.{i}.downsample.0",
                    f"layer{L}.{i}.downsample.1")
            block += 1

    unflat = lambda d: flax.core.freeze(flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in d.items()}))
    return unflat(fp), unflat(fb), n


# --- full-model transplants (architecture-parity proof + checkpoint import) ------

# reference SSD module -> our flax submodule (models/ssd.py creation order).
# f1 = torchvision new_layers[:23] (model/SSD.py:46-50); base1 = [23:] with
# pool5 -> MaxPool2d(3,1,1); extras f2-f6 and cl/bbx heads per model/SSD.py:69-155.
_SSD_F1_CONV_IDX = VGG16_CONV_IDX[:10]          # conv1_1 .. conv4_3
_SSD_BASE1_CONV_IDX = [1, 3, 5]                 # conv5_1..3 inside base1
_SSD_EXTRAS = [("f2.0", "ConvBN_0"), ("f2.2", "ConvBN_1"),
               ("f3.0", "ConvBN_2"), ("f3.2", "ConvBN_3"),
               ("f4.0", "ConvBN_4"), ("f4.2", "ConvBN_5"),
               ("f5.0", "ConvBN_6"), ("f5.2", "Conv_0"),
               ("f6.0", "ConvBN_7"), ("f6.2", "Conv_1")]


def _flat(params):
    import flax
    return flax.traverse_util.flatten_dict(flax.core.unfreeze(params), sep="/")


def _unflat(flat):
    import flax
    return flax.core.freeze(flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in flat.items()}))


def load_reference_ssd(params, state_dict):
    """Transplant a complete reference-SSD state_dict (model/SSD.py:40-160)
    into our flax SSD.  Covers backbone, extras, and all 12 cl/bbx heads;
    with identical weights the two forwards agree elementwise (the class-head
    channel counts must match: build our SSD with num_classes = ref C - 1
    because ours adds an explicit background channel).

    Returns (params, n_loaded).
    """
    flat = _flat(params)
    n = 0

    def put_conv(tk: str, fk: str):
        nonlocal n
        w = np.asarray(state_dict[f"{tk}.weight"])
        kw = f"{fk}/kernel"
        assert flat[kw].shape == conv_to_flax(w).shape, (kw, flat[kw].shape,
                                                         w.shape)
        flat[kw] = conv_to_flax(w)
        if f"{tk}.bias" in state_dict:
            flat[f"{fk}/bias"] = np.asarray(state_dict[f"{tk}.bias"])
        n += 1

    for j, ti in enumerate(_SSD_F1_CONV_IDX):
        put_conv(f"f1.{ti}", f"_VGGStack_0/ConvBN_{j}/Conv_0")
    for j, ti in enumerate(_SSD_BASE1_CONV_IDX):
        put_conv(f"base1.{ti}", f"_VGGStack_1/ConvBN_{j}/Conv_0")
    for tk, fk in _SSD_EXTRAS:
        put_conv(tk, fk if fk.startswith("Conv_") else f"{fk}/Conv_0")
    for i in range(1, 7):       # heads: cl_i -> Conv_{2i}, bbx_i -> Conv_{2i+1}
        put_conv(f"cl{i}.0", f"Conv_{2 * i}")
        put_conv(f"bbx{i}.0", f"Conv_{2 * i + 1}")
    return _unflat(flat), n


# reference YOLOv2 module -> our flax submodule (models/yolov2.py creation
# order): stage1_conv1..13 -> ConvBN_0..12, stage2_a_conv1..7 -> ConvBN_13..19,
# stage2_b_conv -> ConvBN_20, stage3_conv1 -> ConvBN_21, stage3_conv2 -> Conv_0
# (model/YOLOV2.py:42-102).
def load_reference_yolov2(params, batch_stats, state_dict):
    """Transplant a complete reference-YOLOv2 state_dict into our flax YOLOv2
    (build it with ``reorg='darknet'`` for exact forward parity — the
    reference's passthrough reorg is the scrambled darknet-bug variant).

    Returns (params, batch_stats, n_loaded).
    """
    fp, fb = _flat(params), _flat(batch_stats)
    n = 0

    def put(tk: str, base: str):
        nonlocal n
        w = np.asarray(state_dict[f"{tk}.0.weight"])
        kw = f"{base}/Conv_0/kernel"
        assert fp[kw].shape == conv_to_flax(w).shape, (kw, fp[kw].shape,
                                                       w.shape)
        fp[kw] = conv_to_flax(w)
        fp[f"{base}/BatchNorm_0/scale"] = np.asarray(state_dict[f"{tk}.1.weight"])
        fp[f"{base}/BatchNorm_0/bias"] = np.asarray(state_dict[f"{tk}.1.bias"])
        fb[f"{base}/BatchNorm_0/mean"] = np.asarray(
            state_dict[f"{tk}.1.running_mean"])
        fb[f"{base}/BatchNorm_0/var"] = np.asarray(
            state_dict[f"{tk}.1.running_var"])
        n += 1

    for i in range(1, 14):
        put(f"stage1_conv{i}", f"ConvBN_{i - 1}")
    for i in range(1, 8):
        put(f"stage2_a_conv{i}", f"ConvBN_{12 + i}")
    put("stage2_b_conv", "ConvBN_20")
    put("stage3_conv1", "ConvBN_21")
    fp["Conv_0/kernel"] = conv_to_flax(state_dict["stage3_conv2.weight"])
    n += 1
    return _unflat(fp), _unflat(fb), n


def load_torch_checkpoint(model_name: str, params, batch_stats,
                          state_dict: Dict[str, np.ndarray]):
    """Route a torch state_dict into the right converter by key signature.

    The reference constructs SSD from pretrained torchvision VGG16 at init
    (model/SSD.py:46); this is the config-driven equivalent (``torch_ckpt:``
    key).  Accepted signatures:

    - ``features.*``            torchvision vgg16 -> SSD backbone
    - ``f1.* / cl1.*``          full reference SSD state_dict
    - ``conv1./layer1.*``       torchvision resnet50 -> RetinaNet backbone
    - ``stage1_conv1.*``        full reference YOLOv2 state_dict

    Returns (params, batch_stats, n_loaded, description).
    """
    keys = set(state_dict)

    def has(prefix):
        return any(k.startswith(prefix) for k in keys)

    if model_name == "SSD":
        if has("f1.") and has("cl1."):
            params, n = load_reference_ssd(params, state_dict)
            return params, batch_stats, n, "reference SSD (full model)"
        params, n = load_vgg16_into_ssd(params, state_dict)
        return params, batch_stats, n, "vgg16 backbone"
    if model_name == "RetinaNet":
        params, batch_stats, n = load_resnet50_into_retinanet(
            params, batch_stats, state_dict)
        return params, batch_stats, n, "resnet50 backbone"
    if model_name == "YOLOv2":
        params, batch_stats, n = load_reference_yolov2(
            params, batch_stats, state_dict)
        return params, batch_stats, n, "reference YOLOv2 (full model)"
    raise ValueError(
        f"no torch-checkpoint converter for model {model_name!r} "
        f"(supported: SSD, RetinaNet, YOLOv2)")


def read_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load a checkpoint file -> {key: np.ndarray} (CPU)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)
            for k, v in obj.items()}


def convert_generic_conv_bn(torch_prefix: str, state_dict,
                            ) -> Tuple[np.ndarray, dict]:
    """Helper: (conv kernel, {scale, bias, mean, var}) for a torch
    conv+bn pair named ``<prefix>.conv`` / ``<prefix>.bn``."""
    w = conv_to_flax(state_dict[f"{torch_prefix}.conv.weight"])
    bn = {
        "scale": np.asarray(state_dict[f"{torch_prefix}.bn.weight"]),
        "bias": np.asarray(state_dict[f"{torch_prefix}.bn.bias"]),
        "mean": np.asarray(state_dict[f"{torch_prefix}.bn.running_mean"]),
        "var": np.asarray(state_dict[f"{torch_prefix}.bn.running_var"]),
    }
    return w, bn
