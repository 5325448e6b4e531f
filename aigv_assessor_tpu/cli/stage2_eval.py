"""Stage-2 evaluation entry point.

TPU-native equivalent of
`/root/reference/internvl/train/internvl/eval/stage2_eval.py`: like stage-1
eval plus the continuous `score1` output per sample
(`stage2_eval.py:938`) and the second SRCC/PLCC/KRCC block over `pred_score`
(`stage2_eval.py:676-685`). CSV gains a `pred_score` column.
"""

from __future__ import annotations

import sys

from aigv_assessor_tpu.cli import stage1_eval


def main(argv=None):
    return stage1_eval.main(argv, stage=2, mos_scale=0.01)


if __name__ == "__main__":
    main()
    sys.exit(0)
