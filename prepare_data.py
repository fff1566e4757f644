#!/usr/bin/env python3
"""prepare_data CLI: lobe-chunk extraction / synthetic dataset generation.

The reference README (README.md:18) instructs users to run a top-level
prepare_data.py that the reference repo never shipped; this is the
reconstructed entry point (see dram_tpu/data/prepare_data.py for the
semantics recovered from the chunk dataset's expected layout,
reference dataset.py:424-432 and job_runner.py:731-750).

Usage:
  python prepare_data.py --db <root>            # extract lobe chunks
  python prepare_data.py --synthetic <root>     # synthetic dataset
"""

from dram_tpu.data.prepare_data import main
from dram_tpu.utils import select_platform

if __name__ == "__main__":
    select_platform()
    main()
