#!/usr/bin/env python3
"""Training CLI — same surface as the reference train.py (reference
dram/train.py): positional pretrain flag and lr, --batch_size / --smp /
--ckp_path overrides mutating the loaded settings. XLA determinism comes
from fixed PRNG keys (RANDOM_SEED setting) instead of cuDNN flags."""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dram_tpu.utils import (Settings, get_callable_by_name,  # noqa: E402
                            select_platform)

select_platform()


def run_training_job(args):
    # multi-host pod runs: attach this process to the jax.distributed
    # coordinator before the first device query (no-op on single host)
    from dram_tpu.core.mesh import maybe_init_distributed
    maybe_init_distributed()
    if args.smp is None:
        smp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "dram_tpu", "configs", "st_dram_ref.py")
    else:
        smp = args.smp
    settings = Settings(smp)
    settings.OPTIMIZER["lr"] = args.lr
    settings.RELOAD_CHECKPOINT_PATH = args.ckp_path
    settings.RELOAD_CHECKPOINT = args.pretrain > 0
    settings.TRAIN_BATCH_SIZE = args.batch_size
    runner_cls = get_callable_by_name(settings.JOB_RUNNER_CLS)
    runner = runner_cls(settings_module=settings)
    runner.run()


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("pretrain", type=int, nargs="?", default=0,
                        help="reload from checkpoint if > 0")
    parser.add_argument("lr", type=float, nargs="?", default=0.001,
                        help="learning rate")
    parser.add_argument("--batch_size", type=int, nargs="?", default=1,
                        help="training batch size")
    parser.add_argument("--smp", type=str, nargs="?", default=None,
                        help="settings module path")
    parser.add_argument("--ckp_path", type=str, default=None,
                        help="checkpoint path")
    args = parser.parse_args()
    run_training_job(args)
