"""Data layer: 6 dataset parsers -> unified padded batches + device augment.

Canonical target format everywhere in this framework: **center-form xywh,
normalized to [0, 1]**, padded to ``max_boxes`` with a validity mask.

Documented divergence from the reference: its loaders emit *top-left* xywh
rows (dataset/Pascal.py:144-152) while its losses decode them as centers
(LightningFunc/losses.py:846-863) — a half-box systematic offset.  We convert
to center form in the pipeline so the convention is consistent end to end.
"""

from objectdetectionpl_tpu.data.datamodules import DATAMODULES, build_datamodule  # noqa: F401
