"""Reusable flax building blocks for the six detector families."""

from objectdetectionpl_tpu.nn import blocks  # noqa: F401
