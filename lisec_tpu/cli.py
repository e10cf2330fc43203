"""C1 — command-line interface (SURVEY.md §2.5 C1).

    python -m lisec_tpu.cli train  <config.yaml> [key=value ...]
    python -m lisec_tpu.cli eval   <config.yaml> [key=value ...]
    python -m lisec_tpu.cli infer  <config.yaml> --cloud path [--ckpt dir]
    python -m lisec_tpu.cli bench  <config.yaml> [key=value ...]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from lisec_tpu.config import apply_overrides, load_config


def main(argv=None):
    parser = argparse.ArgumentParser(prog="lisec-tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    for name in ("train", "eval", "bench"):
        p = sub.add_parser(name)
        p.add_argument("config")
        p.add_argument("overrides", nargs="*")

    p = sub.add_parser("infer")
    p.add_argument("config")
    p.add_argument("--cloud", required=True)
    p.add_argument("--ckpt", default="")
    p.add_argument("overrides", nargs="*")

    args = parser.parse_args(argv)
    cfg = apply_overrides(load_config(args.config), list(args.overrides))

    if args.command == "train":
        from lisec_tpu.api import train
        train(cfg)
    elif args.command == "eval":
        from lisec_tpu.api import evaluate
        evaluate(cfg)
    elif args.command == "infer":
        from lisec_tpu.api import build_model, infer, load_cloud, preprocess
        from lisec_tpu.training.checkpoint import CheckpointManager
        cloud = load_cloud(args.cloud)   # fail fast on bad input paths
        pipeline = build_model(cfg)
        state = pipeline.init_state(cfg.train.seed)
        ckpt_dir = args.ckpt or cfg.train.ckpt_dir
        if ckpt_dir:
            ckpt = CheckpointManager(ckpt_dir)
            restored = ckpt.restore(state)
            if restored is not None:
                state = restored
            ckpt.close()
        batch = {k: v[None] for k, v in preprocess(cloud, cfg).items()}
        out = infer(pipeline, state, batch)
        print(json.dumps(
            {k: np.asarray(v)[0].tolist() for k, v in out.items()
             if k != "logits"}, indent=2))
    elif args.command == "bench":
        from lisec_tpu.bench_lib import run_benchmark
        print(json.dumps(run_benchmark(cfg)))


if __name__ == "__main__":
    main()
