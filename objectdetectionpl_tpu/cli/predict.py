"""Inference CLI: run a trained checkpoint on image files.

    python -m objectdetectionpl_tpu.cli.predict configs/config.yaml \
        --images img1.jpg img2.jpg [--out-dir preds/] [--export model.shlo]

Outputs one JSON line per image (boxes xyxy px, scores, labels) and, with
--out-dir, annotated PNGs.  --export writes the whole serving graph
(normalize+forward+decode+NMS) as a portable StableHLO artifact.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from objectdetectionpl_tpu.cli import _platform  # noqa: F401  (must precede `import jax`)

import jax.numpy as jnp

from objectdetectionpl_tpu.config import load_config
from objectdetectionpl_tpu.train.loop import Trainer


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config", nargs="?", default=None)
    p.add_argument("--set", nargs=2, action="append", metavar=("K", "V"),
                   default=[])
    p.add_argument("--images", nargs="+", default=[])
    p.add_argument("--out-dir", default=None)
    p.add_argument("--export", default=None,
                   help="write serving StableHLO to this path and exit")
    args = p.parse_args(argv)

    from objectdetectionpl_tpu.cli.run import _coerce
    cfg = load_config(args.config, {k: _coerce(v) for k, v in args.set})
    trainer = Trainer(cfg)
    trainer.maybe_restore()

    if args.export:
        from objectdetectionpl_tpu.utils import export as export_lib
        variables = {"params": trainer.state.eval_params,
                     "batch_stats": trainer.state.batch_stats}
        fn = export_lib.build_inference_fn(trainer.model, variables,
                                           trainer.postprocess)
        export_lib.save(args.export, fn, batch=1, img_size=trainer.img_size)
        print(f"[predict] exported serving graph to {args.export}")
        if not args.images:
            return

    from objectdetectionpl_tpu.data.parsers.common import load_image_rgb
    from objectdetectionpl_tpu.data.pipeline import _resize
    from objectdetectionpl_tpu.utils import viz

    S = trainer.img_size
    for path in args.images:
        img = load_image_rgb(path)
        x = _resize(img, S).astype(np.float32)[None] / 255.0
        res = trainer.predict_step(trainer.state, jnp.asarray(x))
        v = np.asarray(res.valid[0])
        out = {
            "image": path,
            "boxes_xyxy": np.asarray(res.boxes[0])[v].round(2).tolist(),
            "scores": np.asarray(res.scores[0])[v].round(4).tolist(),
            "labels": [trainer.classes[int(c)]
                       for c in np.asarray(res.labels[0])[v]],
        }
        print(json.dumps(out))
        if args.out_dir:
            os.makedirs(args.out_dir, exist_ok=True)
            panel = viz.draw_boxes(x[0], np.asarray(res.boxes[0]),
                                   np.asarray(res.labels[0]),
                                   trainer.classes, valid=v)
            from PIL import Image
            stem = os.path.splitext(os.path.basename(path))[0]
            Image.fromarray(panel).save(
                os.path.join(args.out_dir, f"{stem}_pred.png"))


if __name__ == "__main__":
    main()
