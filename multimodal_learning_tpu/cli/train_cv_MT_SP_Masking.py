"""CLAT stage-1 driver — reference
``MIA 2023/stage1_multi_modal_teacher/train_cv_MT_SP_Masking.py``.

The superpixel-masked comprehensive teacher: ``train_cv_MT`` plus
``--masking 1 --Path_K --Omic_K --num_superpixels`` (recipe
``training_script_Masking.sh:1-2``).  Shares the teacher loop; the masked
step is selected automatically once ``epoch > start_epoch``.
"""
from __future__ import annotations

import sys

from ._platform import apply_platform_override

apply_platform_override()

from .train_cv_MT import main as _main


def main(argv=None):
    # multi-host meshes: no-op unless MML_MULTIHOST=1
    from ..parallel.mesh import maybe_init_distributed
    maybe_init_distributed()
    return _main(argv)


if __name__ == "__main__":
    main(sys.argv[1:])
