"""Serving-export round trip: serialize + reload + identical outputs."""

import numpy as np

import jax
import jax.numpy as jnp

from objectdetectionpl_tpu.models import build_model
from objectdetectionpl_tpu.train.step import make_postprocess
from objectdetectionpl_tpu.utils import export as export_lib


def test_export_roundtrip(rng, tmp_path):
    model = build_model("YOLOv2", 3)
    S = 96
    x = jnp.zeros((1, S, S, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    post = make_postprocess("YOLOv2", 3, S, top_k=16)
    fn = export_lib.build_inference_fn(model, variables, post)

    raw = jnp.asarray(rng.randint(0, 255, (1, S, S, 3)), jnp.uint8)
    direct = fn(raw)

    path = str(tmp_path / "m.shlo")
    export_lib.save(path, fn, batch=1, img_size=S)
    loaded = export_lib.load(path)
    reloaded = loaded(raw)

    np.testing.assert_allclose(np.asarray(reloaded[0]),
                               np.asarray(direct[0]), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(reloaded[4]),
                                  np.asarray(direct[4]))
