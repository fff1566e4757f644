#!/usr/bin/env python3
"""Full-scan inference CLI — clean-contract version of the reference
process_pipeline.py (reference dram/process_pipeline.py, whose hardcoded
grand-challenge glue passed 5 positional args to a 4-param ctor; that
defect is not replicated — see SURVEY.md §7).

Default paths follow the grand-challenge layout (/input/images/ct,
/input/images/pulmonary-lobes, /output/images); all are overridable.
"""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dram_tpu.utils import Settings, select_platform  # noqa: E402
from dram_tpu.infer.engine import LesionSegTest  # noqa: E402

select_platform()


def run_testing_job(args):
    if args.smp is None:
        smp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "dram_tpu", "configs", "st_dram_ref_att.py")
    else:
        smp = args.smp
    settings = Settings(smp)
    # checkpoints stay rooted at the settings' MODEL_ROOT_PATH (or come from
    # an explicit --ckp_path); the reference redirected the model root to the
    # output dir, which made the newest-checkpoint lookup search an empty
    # directory (process_pipeline.py:17-22 glue defect).
    if args.ckp_path is not None:
        settings.RELOAD_CHECKPOINT_PATH = args.ckp_path
    settings.RELOAD_CHECKPOINT = True
    if args.shard:
        # scan-level multi-chip parallelism: N scans in flight, one per
        # chip ("-1" / "auto" = every local device)
        settings.SHARD_SCANS = -1 if args.shard in ("auto", "-1") \
            else int(args.shard)
    runner = LesionSegTest(settings_module=settings,
                           scan_path=args.input,
                           lobe_path=args.lobes,
                           output_path=args.output,
                           task_name=args.task_name)
    runner.run()


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--input", type=str, default="/input/images/ct/",
                        help="directory of CT .mha scans (deployment mode); "
                             "omit to use the settings' test split")
    parser.add_argument("--lobes", type=str,
                        default="/input/images/pulmonary-lobes/",
                        help="directory of lobe-segmentation .mha masks")
    parser.add_argument("--output", type=str, default="/output/images/",
                        help="output directory")
    parser.add_argument("--smp", type=str, default=None,
                        help="settings module path")
    parser.add_argument("--ckp_path", type=str, default=None,
                        help="checkpoint to load")
    parser.add_argument("--task_name", type=str, default="test")
    parser.add_argument("--shard", type=str, default=None,
                        help="scan-level multi-chip parallelism: N scans "
                             "in flight, one per chip ('auto'/'-1' = every "
                             "local device)")
    parser.add_argument("--use_test_split", action="store_true",
                        help="score the settings' TEST_CSV split instead of "
                             "an input directory")
    args = parser.parse_args()
    if args.use_test_split:
        args.input = None
        args.lobes = None
    run_testing_job(args)
