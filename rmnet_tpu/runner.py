"""CLI entry point (capability of reference runner.py:28-109).

    python -m rmnet_tpu.runner                       # train
    python -m rmnet_tpu.runner --test --weights P    # evaluate
    python -m rmnet_tpu.runner --inference --weights P  # benchmark PNGs
    python -m rmnet_tpu.runner --eval-server --ckpt-dir D  # continuous eval

Config comes from a Python file defining configure(cfg) (--cfg), plus
--set dot-path overrides (replacing the reference's exec()-based config and
limited CLI knobs).
"""

from __future__ import annotations

import argparse
import logging
import random
import sys

import numpy as np


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="rmnet_tpu runner")
    parser.add_argument("--exp", dest="exp_name", default=None, type=str)
    parser.add_argument("--cfg", dest="cfg_file", default=None, type=str,
                        help="Python file defining configure(cfg) or CFG dict")
    parser.add_argument("--rand", dest="randomize", action="store_true",
                        help="Randomize (do not use a fixed seed)")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--inference", action="store_true")
    parser.add_argument("--eval-server", dest="eval_server", action="store_true")
    parser.add_argument("--ckpt-dir", dest="ckpt_dir", default=None, type=str)
    parser.add_argument("--remote", default=None, type=str,
                        help="HTTP directory URL to scrape for new .pth "
                             "checkpoints (eval-server mode)")
    parser.add_argument("--weights", default=None, type=str)
    parser.add_argument("--set", dest="overrides", action="append", default=[],
                        metavar="PATH=VALUE", help="config override, repeatable")
    parser.add_argument("--platform", default=None, type=str,
                        help="force a JAX platform (e.g. cpu, tpu) — wins over "
                             "environment-pinned platforms")
    return parser.parse_args(argv)


def main(argv=None):
    from rmnet_tpu.config import Config

    args = get_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from rmnet_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = Config.from_file(args.cfg_file)
    cfg.apply_overrides(args.overrides)

    if not args.randomize:
        random.seed(cfg.CONST.RNG_SEED)
        np.random.seed(cfg.CONST.RNG_SEED)
    if args.exp_name is not None:
        cfg.CONST.EXP_NAME = args.exp_name
    if args.weights is not None:
        cfg.CONST.WEIGHTS = args.weights

    if args.eval_server:
        from rmnet_tpu.core.eval_server import eval_server

        ckpt_dir = args.ckpt_dir or f"{cfg.DIR.OUTPUT_DIR}/checkpoints/{cfg.CONST.EXP_NAME}"
        eval_server(cfg, ckpt_dir, remote_url=args.remote)
        return

    if not args.test and not args.inference:
        if cfg.TRAIN.NETWORK not in ("RMNet", "TinyFlowNet"):
            logging.error('cfg.TRAIN.NETWORK must be "RMNet" or "TinyFlowNet".')
            sys.exit(1)
        from rmnet_tpu.core.train import train_net

        train_net(cfg)
    else:
        if not cfg.CONST.WEIGHTS:
            logging.error("Please specify the file path of checkpoint (--weights).")
            sys.exit(2)
        if args.test:
            from rmnet_tpu.core.test import test_net

            test_net(cfg)
        else:
            from rmnet_tpu.core.inference import inference_net

            inference_net(cfg)


if __name__ == "__main__":
    logging.basicConfig(
        format="[%(levelname)s] %(asctime)s %(message)s", level=logging.INFO
    )
    main()
