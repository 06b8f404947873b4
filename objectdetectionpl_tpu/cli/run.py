"""CLI entry point: config -> datamodule -> model -> fit -> test.

Same UX as the reference (run.py:70-118):

    python -m objectdetectionpl_tpu.cli.run [configs/config.yaml] [--key value]...

Any config field can be overridden on the command line with --key value.
"""

from __future__ import annotations

import argparse
import os
import sys

from objectdetectionpl_tpu.cli import _platform  # noqa: F401  (must precede `import jax`)

import jax

from objectdetectionpl_tpu.config import load_config
from objectdetectionpl_tpu.train.loop import Trainer

try:  # persistent compilation cache (first compiles are minutes here)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__)))),
                          ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config", nargs="?", default=None,
                   help="YAML config path (reference key surface)")
    p.add_argument("--set", nargs=2, action="append", metavar=("KEY", "VALUE"),
                   default=[], help="override a config field")
    return p.parse_args(argv)


def _coerce(v: str):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    return v


def main(argv=None):
    args = parse_args(argv)
    overrides = {k: _coerce(v) for k, v in args.set}
    cfg = load_config(args.config, overrides)

    # Multi-host: initialize jax.distributed before the first backend touch
    # when coordinator env vars are set (no-op single-host).  SURVEY.md §2.11.
    from objectdetectionpl_tpu.parallel import maybe_initialize
    if maybe_initialize():
        print(f"[run] distributed: process {jax.process_index()} / "
              f"{jax.process_count()}")

    print(f"[run] model={cfg.model_name} dataset={cfg.data_module} "
          f"img_size={cfg.effective_img_size} batch={cfg.batch_size} "
          f"accum={cfg.accumulate_grad_batches}")
    trainer = Trainer(cfg)
    if cfg.tune:
        from objectdetectionpl_tpu.train import tune
        if cfg.auto_lr_find:
            lr = tune.auto_lr_find(trainer)
            print(f"[tune] auto_lr_find suggests lr={lr:.2e}")
            trainer.scheduler.base_lr = lr
            cfg.lr = lr
        if cfg.auto_scale_batch_size == "power":
            bs = tune.auto_scale_batch_size(trainer, start=cfg.batch_size)
            print(f"[tune] auto_scale_batch_size suggests batch_size={bs}")
    try:
        if cfg.max_epochs > 0:
            trainer.fit()
        else:
            trainer.maybe_restore()   # eval-only: max_epochs 0 + checkpoint
        if cfg.test:
            trainer.dm.setup("test")
            return trainer.test()
        return None
    finally:
        # drain in-flight async checkpoint saves — letting the interpreter
        # shut down with a pending orbax write crashes its executor
        # ("cannot schedule new futures after interpreter shutdown")
        trainer.ckpt.close()


if __name__ == "__main__":
    main(sys.argv[1:])
