"""Serving export: jitted end-to-end inference -> serialized StableHLO.

No reference equivalent (the reference serves nothing); this is the
TPU-native deployment path: the whole pipeline (normalize -> forward ->
decode -> NMS) exports as one portable StableHLO artifact loadable without
the framework (jax.export round-trip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_inference_fn(model, variables, postprocess, fold_preproc=None):
    """uint8 [B, S, S, 3] -> NMSResult, the full serving graph.

    ``fold_preproc`` (default: on for models with a known stem path) bakes
    the /255 normalize into the stem conv kernel (utils/fuse.
    fold_input_scale) — exact, and measured +8% end-to-end on YOLOv5s-640
    together with the transpose space-to-depth (BASELINE.md round 4).
    """
    from objectdetectionpl_tpu.utils.fuse import fold_input_scale

    folded = None
    if fold_preproc is None or fold_preproc:
        try:
            folded = {**variables,
                      "params": fold_input_scale(variables["params"],
                                                 1.0 / 255.0)}
        except (KeyError, TypeError):
            if fold_preproc:       # explicitly requested but no known stem
                raise
            folded = None          # auto mode: fall back to dividing

    def fn(raw_uint8):
        if folded is not None:
            # The fold is only a win together with the transpose
            # space-to-depth: fold + 'slices' measured 3732 img/s vs 4000
            # baseline (the uint8 cast fuses into 4 strided gathers that
            # re-read the raw image 4x), fold + transpose 4104 (BASELINE.md
            # round 4).  space_to_depth resolves OBJDET_S2D at trace time,
            # which is exactly now — force the winning combination for the
            # traced graph, then restore.
            import os
            prev = os.environ.get("OBJDET_S2D")
            os.environ["OBJDET_S2D"] = "transpose"
            try:
                images = raw_uint8.astype(model.dtype)
                out = model.apply(folded, images, train=False)
            finally:
                if prev is None:
                    os.environ.pop("OBJDET_S2D", None)
                else:
                    os.environ["OBJDET_S2D"] = prev
        else:
            images = raw_uint8.astype(model.dtype) / 255.0
            out = model.apply(variables, images, train=False)
        # plain tuple (boxes, obj, scores, labels, valid): jax.export cannot
        # serialize custom NamedTuple pytree nodes
        return tuple(postprocess(out))

    return fn


def export_serialized(fn, batch: int, img_size: int) -> bytes:
    """Serialize the jitted inference fn to portable bytes (StableHLO)."""
    from jax import export as jexport

    spec = jax.ShapeDtypeStruct((batch, img_size, img_size, 3), jnp.uint8)
    exported = jexport.export(jax.jit(fn))(spec)
    return exported.serialize()


def load_serialized(blob: bytes):
    """Deserialize and return a callable (runs via jax on any backend)."""
    from jax import export as jexport

    exported = jexport.deserialize(blob)
    return lambda x: exported.call(x)


def save(path: str, fn, batch: int, img_size: int):
    with open(path, "wb") as f:
        f.write(export_serialized(fn, batch, img_size))


def load(path: str):
    with open(path, "rb") as f:
        return load_serialized(f.read())
