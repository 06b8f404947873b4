"""Honor ``JAX_PLATFORMS=cpu`` before the first jax backend touch.

The axon TPU plugin ignores a ``JAX_PLATFORMS=cpu`` env var (CLAUDE.md);
importing this module translates it into a ``jax.config`` update BEFORE any
backend is initialized, so CPU-only drives never claim the (single,
tunneled) TPU chip.

IMPORTANT: both CLIs import this module first; it only works while
``objectdetectionpl_tpu/__init__.py`` and ``cli/__init__.py`` stay jax-free
— a jax-touching import in either would initialize the axon backend before
this runs.
"""

import os

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
