"""Test harness: force JAX onto CPU with 8 virtual devices.

Must run before the first `import jax` anywhere (pytest loads conftest first).
Multi-device tests exercise the shard_map data-parallel path without TPU
hardware, per SURVEY.md §4.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin overrides the JAX_PLATFORMS env var; pin the platform
# through jax.config before any backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: this box has 1 CPU core and recompiling the
# suite dominates wall time
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_path():
    """Path to the PyTorch reference repo (golden-parity oracles only)."""
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not available")
    return REFERENCE


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def make_padded_targets(rng, batch: int, max_boxes: int, num_classes: int,
                        counts=None):
    """Random padded targets (labels, boxes xywh-normalized, mask)."""
    labels = rng.randint(0, num_classes, size=(batch, max_boxes)).astype(np.int32)
    cx = rng.uniform(0.1, 0.9, size=(batch, max_boxes))
    cy = rng.uniform(0.1, 0.9, size=(batch, max_boxes))
    w = rng.uniform(0.05, 0.3, size=(batch, max_boxes))
    h = rng.uniform(0.05, 0.3, size=(batch, max_boxes))
    boxes = np.stack([cx, cy, w, h], -1).astype(np.float32)
    mask = np.zeros((batch, max_boxes), bool)
    for i in range(batch):
        n = counts[i] if counts is not None else rng.randint(1, max_boxes + 1)
        mask[i, :n] = True
    return labels, boxes, mask


def to_reference_rows(labels, boxes, mask):
    """Padded targets -> the reference's ragged [N, 6] rows (b, c, x, y, w, h)."""
    rows = []
    for b in range(labels.shape[0]):
        for m in range(labels.shape[1]):
            if mask[b, m]:
                rows.append([b, labels[b, m], *boxes[b, m]])
    return np.asarray(rows, np.float32).reshape(-1, 6)
