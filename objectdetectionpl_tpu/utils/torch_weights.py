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


def _convbn_putter(fp, fb, state_dict, conv_suffix: str, bn_suffix: str):
    """Shared ConvBN transplant closure: torch ``<tk><conv_suffix>.weight`` +
    BN at ``<tk><bn_suffix>.*`` into our ``<base>/Conv_0`` + ``BatchNorm_0``.
    Returns (put, count) where count() reads the running tally."""
    n = [0]

    def put(tk: str, base: str, bias: bool = False):
        w = np.asarray(state_dict[f"{tk}{conv_suffix}.weight"])
        kw = f"{base}/Conv_0/kernel"
        assert fp[kw].shape == conv_to_flax(w).shape, (kw, fp[kw].shape,
                                                       w.shape)
        fp[kw] = conv_to_flax(w)
        if bias:
            fp[f"{base}/Conv_0/bias"] = np.asarray(
                state_dict[f"{tk}{conv_suffix}.bias"])
        bnk = f"{tk}{bn_suffix}"
        if f"{bnk}.weight" in state_dict:
            fp[f"{base}/BatchNorm_0/scale"] = np.asarray(
                state_dict[f"{bnk}.weight"])
            fp[f"{base}/BatchNorm_0/bias"] = np.asarray(
                state_dict[f"{bnk}.bias"])
            fb[f"{base}/BatchNorm_0/mean"] = np.asarray(
                state_dict[f"{bnk}.running_mean"])
            fb[f"{base}/BatchNorm_0/var"] = np.asarray(
                state_dict[f"{bnk}.running_var"])
        n[0] += 1

    return put, lambda: n[0]


def _put_plain_conv(fp, state_dict, tk: str, fk: str):
    """torch plain nn.Conv2d (weight + optional bias) -> flax ``<fk>``."""
    w = np.asarray(state_dict[f"{tk}.weight"])
    kw = f"{fk}/kernel"
    assert fp[kw].shape == conv_to_flax(w).shape, (kw, fp[kw].shape, w.shape)
    fp[kw] = conv_to_flax(w)
    if f"{tk}.bias" in state_dict:
        fp[f"{fk}/bias"] = np.asarray(state_dict[f"{tk}.bias"])


def load_reference_yolov5(params, batch_stats, state_dict,
                          prefix: str = "backbone_head."):
    """Transplant a complete reference-YOLOv5 state_dict
    (model/YOLOV5.py:20-102, backbone_head seq0-seq21) into our flax YOLOv5.

    The only non-identity remap is the Focus stem: the reference slices
    (even,even),(odd,even),(even,odd),(odd,odd) pixel phases into channel
    blocks (YoloV5Utils.py:120-125) while our ``space_to_depth`` emits
    (even,even),(even,odd),(odd,even),(odd,odd), so the stem conv's input
    channels are permuted blockwise ([0,2,1,3]) to compensate.

    Returns (params, batch_stats, n_loaded).
    """
    fp, fb = _flat(params), _flat(batch_stats)
    sd = {k[len(prefix):] if k.startswith(prefix) else k: v
          for k, v in state_dict.items()}
    put, count = _convbn_putter(fp, fb, sd, ".conv", ".bn")

    def put_csp(tk: str, base: str):
        # BottleneckCSP (YoloV5Utils.py:71-94): cv1/m/cv3/cv2/bn/cv4 ->
        # ConvBN_0 / BottleneckV5_i / Conv_0 / Conv_1 / BatchNorm_0 / ConvBN_1
        put(f"{tk}.cv1", f"{base}/ConvBN_0")
        i = 0
        while f"{tk}.m.{i}.cv1.conv.weight" in sd:
            put(f"{tk}.m.{i}.cv1", f"{base}/BottleneckV5_{i}/ConvBN_0")
            put(f"{tk}.m.{i}.cv2", f"{base}/BottleneckV5_{i}/ConvBN_1")
            i += 1
        _put_plain_conv(fp, sd, f"{tk}.cv3", f"{base}/Conv_0")
        _put_plain_conv(fp, sd, f"{tk}.cv2", f"{base}/Conv_1")
        fp[f"{base}/BatchNorm_0/scale"] = np.asarray(sd[f"{tk}.bn.weight"])
        fp[f"{base}/BatchNorm_0/bias"] = np.asarray(sd[f"{tk}.bn.bias"])
        fb[f"{base}/BatchNorm_0/mean"] = np.asarray(
            sd[f"{tk}.bn.running_mean"])
        fb[f"{base}/BatchNorm_0/var"] = np.asarray(
            sd[f"{tk}.bn.running_var"])
        put(f"{tk}.cv4", f"{base}/ConvBN_1")

    # Focus stem with the phase-block input permutation
    put("seq0_Focus.conv", "Focus_0/ConvBN_0")
    k = fp["Focus_0/ConvBN_0/Conv_0/kernel"]
    C = k.shape[2] // 4
    order = np.concatenate([np.arange(t * C, (t + 1) * C)
                            for t in (0, 2, 1, 3)])
    fp["Focus_0/ConvBN_0/Conv_0/kernel"] = k[:, :, order, :]

    put("seq1_Conv", "ConvBN_0")
    put("seq2_Bottleneck.cv1", "BottleneckV5_0/ConvBN_0")
    put("seq2_Bottleneck.cv2", "BottleneckV5_0/ConvBN_1")
    put("seq3_Conv", "ConvBN_1")
    put_csp("seq4_BottleneckCSP", "BottleneckCSP_0")
    put("seq5_Conv", "ConvBN_2")
    put_csp("seq6_BottleneckCSP", "BottleneckCSP_1")
    put("seq7_Conv", "ConvBN_3")
    put("seq8_SPP.cv1", "SPP_0/ConvBN_0")
    put("seq8_SPP.cv2", "SPP_0/ConvBN_1")
    put_csp("seq9_BottleneckCSP", "BottleneckCSP_2")
    put_csp("seq10_BottleneckCSP", "BottleneckCSP_3")
    _put_plain_conv(fp, sd, "seq11_Conv2d", "Conv_0")
    put("seq14_Conv", "ConvBN_4")
    put_csp("seq15_BottleneckCSP", "BottleneckCSP_4")
    _put_plain_conv(fp, sd, "seq16_Conv2d", "Conv_1")
    put("seq19_Conv", "ConvBN_5")
    put_csp("seq20_BottleneckCSP", "BottleneckCSP_5")
    _put_plain_conv(fp, sd, "seq21_Conv2d", "Conv_2")
    # plain convs: 6 CSP blocks x (cv2, cv3) + 3 detection heads
    return _unflat(fp), _unflat(fb), count() + 15


# YOLOv3 extractor layout (model/YOLOV3.py:73-175): conv numbers per group
# with residual letters a..w interleaved exactly as built.
_V3_GROUPS = [  # (group ConvBN number, [(res cb1, res cb2), ...])
    (2, [(3, 4)]),
    (5, [(6, 7), (8, 9)]),
    (10, [(11, 12), (13, 14), (15, 16), (17, 18), (19, 20), (21, 22),
          (23, 24), (25, 26)]),
    (27, [(28, 29), (30, 31), (32, 33), (34, 35), (36, 37), (38, 39),
          (40, 41), (42, 43)]),
    (44, [(45, 46), (47, 48), (49, 50), (51, 52)]),
]
_V3_LETTERS = "abcdefghijklmnopqrstuvw"


def load_reference_yolov3(params, batch_stats, state_dict):
    """Transplant a complete reference-YOLOv3 state_dict
    (model/YOLOV3.py:73-234: extractor SelectiveSequential + 5 detector
    sequences) into our flax YOLOv3.  Returns (params, batch_stats, n)."""
    fp, fb = _flat(params), _flat(batch_stats)
    put, count = _convbn_putter(fp, fb, state_dict, ".layers.0", ".layers.1")

    dk = "Darknet53_0"
    put("extractor.1_convbatch", f"{dk}/ConvBN_0")
    res_i, letter_i = 0, 0
    for gi, (conv_no, residuals) in enumerate(_V3_GROUPS, start=1):
        put(f"extractor.{conv_no}_convbatch", f"{dk}/ConvBN_{gi}")
        for cb1, cb2 in residuals:
            letter = _V3_LETTERS[letter_i]
            put(f"extractor.{letter}_residual.{cb1}_convbatch",
                f"{dk}/Residual_{res_i}/ConvBN_0")
            put(f"extractor.{letter}_residual.{cb2}_convbatch",
                f"{dk}/Residual_{res_i}/ConvBN_1")
            res_i += 1
            letter_i += 1

    # detector sequences -> (_DetectSeq_0, ConvBN_0, _DetectSeq_1, ConvBN_1,
    # _DetectSeq_2); each _DetectSeq holds ConvBN_0..5 + Conv_0
    seqs = [("detector.0", "_DetectSeq_0", 53),
            ("detector.2", "_DetectSeq_1", 62),
            ("detector.4", "_DetectSeq_2", 71)]
    for tbase, fbase, start in seqs:
        for j in range(6):
            put(f"{tbase}.{start + j}_convbatch", f"{fbase}/ConvBN_{j}")
        _put_plain_conv(fp, state_dict, f"{tbase}.{start + 6}_conv",
                        f"{fbase}/Conv_0")
    put("detector.1.60_convbatch", "ConvBN_0")
    put("detector.3.69_convbatch", "ConvBN_1")
    return _unflat(fp), _unflat(fb), count() + 3


def load_reference_yolov4(params, batch_stats, state_dict):
    """Transplant a complete reference-YOLOv4 state_dict (model/YOLOV4.py:
    136-283 down1-5/neek/head, YoloV4Utils.py:264-481) into our flax YOLOv4.
    Returns (params, batch_stats, n)."""
    fp, fb = _flat(params), _flat(batch_stats)
    put, count = _convbn_putter(fp, fb, state_dict, ".conv.0", ".conv.1")

    for i in range(1, 9):                                   # DownSample1
        put(f"down1.conv{i}", f"DownSample1_0/ConvBN_{i - 1}")
    nblocks = {2: 2, 3: 8, 4: 8, 5: 4}
    for d in range(2, 6):                                   # DownSample2-5
        base = f"DownSampleCSP_{d - 2}"
        for i, fi in ((1, 0), (2, 1), (3, 2), (4, 3), (5, 4)):
            put(f"down{d}.conv{i}", f"{base}/ConvBN_{fi}")
        for r in range(nblocks[d]):
            put(f"down{d}.resblock.module_list.{r}.0",
                f"{base}/MishResBlock_0/ConvBN_{2 * r}")
            put(f"down{d}.resblock.module_list.{r}.1",
                f"{base}/MishResBlock_0/ConvBN_{2 * r + 1}")
    for i in range(1, 21):                                  # Neck conv1-20
        put(f"neek.conv{i}", f"Neck_0/ConvBN_{i - 1}")
    # Head: convs 2/10/18 are the plain (linear, bias) output convs
    head_map = [("conv1", "ConvBN_0"), ("conv3", "ConvBN_1"),
                ("conv4", "ConvBN_2"), ("conv5", "ConvBN_3"),
                ("conv6", "ConvBN_4"), ("conv7", "ConvBN_5"),
                ("conv8", "ConvBN_6"), ("conv9", "ConvBN_7"),
                ("conv11", "ConvBN_8"), ("conv12", "ConvBN_9"),
                ("conv13", "ConvBN_10"), ("conv14", "ConvBN_11"),
                ("conv15", "ConvBN_12"), ("conv16", "ConvBN_13"),
                ("conv17", "ConvBN_14")]
    for tk, fk in head_map:
        put(f"head.{tk}", fk)
    for tk, fk in [("conv2", "Conv_0"), ("conv10", "Conv_1"),
                   ("conv18", "Conv_2")]:
        _put_plain_conv(fp, state_dict, f"head.{tk}.conv.0", fk)
    return _unflat(fp), _unflat(fb), count() + 3


def load_reference_retinanet(params, batch_stats, state_dict):
    """Transplant a complete reference-RetinaNet state_dict
    (model/RetinaNet.py:44-115 + model/backbone/RetinaNetbone.py:8-76) into
    our flax RetinaNet.  Returns (params, batch_stats, n)."""
    fp, fb = _flat(params), _flat(batch_stats)
    n = 0

    def put_convbn(conv_key, bn_key, base):
        nonlocal n
        w = np.asarray(state_dict[f"{conv_key}.weight"])
        kw = f"{base}/Conv_0/kernel"
        assert fp[kw].shape == conv_to_flax(w).shape, (kw, fp[kw].shape,
                                                       w.shape)
        fp[kw] = conv_to_flax(w)
        fp[f"{base}/BatchNorm_0/scale"] = np.asarray(
            state_dict[f"{bn_key}.weight"])
        fp[f"{base}/BatchNorm_0/bias"] = np.asarray(
            state_dict[f"{bn_key}.bias"])
        fb[f"{base}/BatchNorm_0/mean"] = np.asarray(
            state_dict[f"{bn_key}.running_mean"])
        fb[f"{base}/BatchNorm_0/var"] = np.asarray(
            state_dict[f"{bn_key}.running_var"])
        n += 1

    fpn = "ResNetFPN_0"
    put_convbn("fpn.conv1", "fpn.bn1", f"{fpn}/ConvBN_0")
    block = 0
    for L, n_blocks in enumerate(RESNET50_BLOCKS, start=1):
        for i in range(n_blocks):
            base = f"{fpn}/Bottleneck_{block}"
            for c in range(1, 4):
                put_convbn(f"fpn.layer{L}.{i}.conv{c}",
                           f"fpn.layer{L}.{i}.bn{c}", f"{base}/ConvBN_{c - 1}")
            if f"fpn.layer{L}.{i}.downsample.0.weight" in state_dict:
                put_convbn(f"fpn.layer{L}.{i}.downsample.0",
                           f"fpn.layer{L}.{i}.downsample.1",
                           f"{base}/ConvBN_3")
            block += 1
    # FPN plain convs in our creation order (models/retinanet.py:62-71)
    fpn_convs = [("fpn.conv6", "Conv_0"), ("fpn.conv7", "Conv_1"),
                 ("fpn.latlayer1", "Conv_2"), ("fpn.toplayer1", "Conv_3"),
                 ("fpn.latlayer2", "Conv_4"), ("fpn.toplayer2", "Conv_5"),
                 ("fpn.latlayer3", "Conv_6")]
    for tk, fk in fpn_convs:
        _put_plain_conv(fp, state_dict, tk, f"{fpn}/{fk}")
        n += 1
    # shared heads: Sequential conv indices 0,2,4,6 + output 8
    for tname, fname in (("loc_head", "_Head_0"), ("cls_head", "_Head_1")):
        for j, ti in enumerate((0, 2, 4, 6, 8)):
            _put_plain_conv(fp, state_dict, f"{tname}.{ti}",
                            f"{fname}/Conv_{j}")
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
