"""Per-family integration: one train step + predict/NMS on tiny inputs.

SSD/RetinaNet run at reduced sizes where possible; SSD's 8732-dbox head is
shape-locked to 300px, so it runs under the ``slow`` marker (RUN_SLOW=1).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from objectdetectionpl_tpu.models import build_model
from objectdetectionpl_tpu.ops import losses as loss_lib
from objectdetectionpl_tpu.train import step as step_lib
from tests.conftest import make_padded_targets

SLOW = os.environ.get("RUN_SLOW", "0") != "1"


def _one_step_and_predict(model_name, img, C=3, variant="Yolov5s"):
    import optax
    rng = np.random.RandomState(0)
    model = build_model(model_name, C, yolov5_type=variant)
    loss_fn = loss_lib.make_loss(model_name, C, img)
    x = jnp.asarray(rng.rand(1, img, img, 3), jnp.float32)
    labels, boxes, mask = make_padded_targets(rng, 1, 4, C)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    def objective(p, bs):
        kwargs = {"params": p}
        if bs:
            out, upd = model.apply({"params": p, "batch_stats": bs}, x,
                                   train=True, mutable=["batch_stats"])
        else:
            out = model.apply({"params": p}, x, train=True)
            upd = {"batch_stats": bs}
        m = loss_fn(out, jnp.asarray(labels), jnp.asarray(boxes),
                    jnp.asarray(mask))
        return m["loss"], upd["batch_stats"]

    (loss, _), grads = jax.jit(
        jax.value_and_grad(objective, has_aux=True))(params, bstats)
    assert np.isfinite(float(loss)), model_name
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert gnorm > 0, model_name

    post = step_lib.make_postprocess(model_name, C, img, top_k=32)
    out = model.apply({"params": params, "batch_stats": bstats}, x,
                      train=False)
    res = jax.jit(post)(out)
    assert res.boxes.shape[0] == 1
    assert bool(jnp.all(jnp.isfinite(res.boxes)))


def test_yolov2_integration():
    _one_step_and_predict("YOLOv2", 96)


def test_yolov3_integration():
    _one_step_and_predict("YOLOv3", 96)


def test_yolov4_integration():
    _one_step_and_predict("YOLOv4", 96)


def test_yolov5_integration():
    _one_step_and_predict("YOLOv5", 64)


@pytest.mark.skipif(SLOW, reason="SSD is shape-locked to 300px (set RUN_SLOW=1)")
def test_ssd_integration():
    _one_step_and_predict("SSD", 300)


def test_retinanet_integration():
    _one_step_and_predict("RetinaNet", 128)
