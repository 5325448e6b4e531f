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
    # NOTE: the reference divides mos by 100 only in the stage-2 TRAINING
    # dataset (`stage2_train.py:613`); the standalone stage-2 eval keeps raw
    # mos (`stage2_eval.py:373,500` — no /100). Rank correlations are
    # unaffected either way, but the CSV 'mos' column must match.
    return stage1_eval.main(argv, stage=2, mos_scale=1.0)


if __name__ == "__main__":
    main()
    sys.exit(0)
