from aigv_assessor_tpu.train.trainer import Trainer, TrainConfig  # noqa: F401
