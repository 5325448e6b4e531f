"""Stage-2 training entry point (LoRA fine-tune + MOS score regression).

TPU-native equivalent of
`/root/reference/internvl/train/internvl/train/stage2_train.py` (launched by
`shell/train/stage2_train.sh`): LoRA adapters on ViT + LLM
(`--use_backbone_lora 8 --use_llm_lora 8`), trainable `mlpscore` head,
L1 loss vs mos/100 (the /100 normalization is applied at the dataset level in
the reference, `stage2_train.py:613`), best checkpoint by SRCC of the
predicted score (`stage2_train.py:300-304`), and a bare LoRA weight dump on
best (`save_lora_weights`, lines 223-235).
"""

from __future__ import annotations

import os
import sys

from aigv_assessor_tpu.cli import stage1_train
from aigv_assessor_tpu.train.checkpoint import save_lora_weights


def main(argv=None):
    def make_on_best(args):
        def on_best(params, step):
            # reference dumps bare LoRA tensors on every new best
            # (stage2_train.py:223-235, 300-307)
            save_lora_weights(
                os.path.join(args.output_dir, "lora_weights.msgpack"), params
            )
        return on_best

    trainer = stage1_train.main(
        argv, stage=2, best_metric="SRCC_score", mos_scale=0.01,
        on_best=make_on_best,
    )
    # final LoRA artifact regardless of eval cadence
    out = os.path.join(trainer.cfg.output_dir, "lora_weights.msgpack")
    save_lora_weights(out, trainer.state.params)
    return trainer


if __name__ == "__main__":
    main()
    sys.exit(0)
