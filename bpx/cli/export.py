"""Export a trained run directory as a self-contained serving artifact.

The reference has no deployment path at all — its only inference is the
eval pass wired into the training CLI (ref: train.py:451-480).  This CLI
closes that gap the TPU-native way: it restores a run's best (or latest)
checkpoint, traces the serving forward (model + task post-processing)
once at a fixed batch size, and serializes it with ``jax.export`` as a
StableHLO module with the trained params baked in as constants.  The
artifact is then served by :class:`bpx.serve.ExportedPredictor` with
nothing but jax installed — no model code, config tree, checkpoint, or
dataset on the serving host.

Usage::

    python -m bpx.cli.export runs/moviescope/run_Seed1_run \
        --out model.bpx --batch_size 8 [--tag best] [--platform tpu]

The run directory must contain the ``config.json`` snapshot and the
orbax ``best``/``latest`` checkpoints written by training.  The example
batch used for tracing is synthesized from the config shapes, so the
dataset need not be present.  ``--platform`` cross-lowers (e.g. export
on a CPU build host for TPU serving).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> str:
    p = argparse.ArgumentParser(
        description="export a trained run as a jax.export serving artifact")
    p.add_argument("run_dir", help="run directory (contains config.json + "
                                   "orbax best/latest)")
    p.add_argument("--out", default=None,
                   help="artifact path (default: <run_dir>/model.bpx)")
    p.add_argument("--batch_size", type=int, default=8,
                   help="compiled serving batch size (clients may send "
                        "fewer rows; they are padded and sliced)")
    p.add_argument("--tag", default="best", choices=["best", "latest"])
    p.add_argument("--platform", action="append", default=None,
                   help="lowering platform(s), repeatable (e.g. tpu, cpu); "
                        "default: the current backend")
    args = p.parse_args(argv)

    cfg_path = os.path.join(args.run_dir, "config.json")
    with open(cfg_path) as f:
        snapshot = json.load(f)

    from bpx.config import config_from_dict
    from bpx.data.synthetic import example_batch
    from bpx.serve import Predictor

    exp = config_from_dict(snapshot)
    batch = example_batch(exp, args.batch_size)
    pred = Predictor.from_checkpoint(exp, args.run_dir, batch,
                                     batch_size=args.batch_size,
                                     tag=args.tag)
    out = args.out or os.path.join(args.run_dir, "model.bpx")
    blob = pred.export(batch, out, platforms=args.platform)
    sys.stderr.write(
        f"exported {exp.model.model} ({args.tag}, batch {args.batch_size}, "
        f"platforms {args.platform or 'default'}) -> {out} "
        f"({len(blob) / 1e6:.1f} MB)\n")
    return out


if __name__ == "__main__":
    main()
