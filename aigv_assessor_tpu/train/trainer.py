"""Training loop: jitted step, optax optimizer, freeze masks, grad
accumulation, checkpointing, periodic custom eval.

Replaces HF `Trainer` + the reference's `CustomTrainer` overrides
(`/root/reference/internvl/train/internvl/train/stage1_train.py:217-337`) and
DeepSpeed ZeRO-1 with one `jit`-compiled SPMD train step over a
(data, fsdp, tensor) mesh:

- optimizer: optax adamw, cosine schedule with linear warmup (matching
  `--lr_scheduler_type cosine --warmup_ratio 0.03 --weight_decay 0.01`,
  `shell/train/stage1_train.sh:52-55`), masked so frozen params carry no
  state;
- gradient accumulation via `lax.scan` over microbatches inside the compiled
  step (`GRADIENT_ACC` env math, `stage1_train.sh:6`);
- params/optimizer state sharded by `parallel.sharding` rules, gradients
  reduce-scattered by GSPMD (ZeRO-equivalent);
- periodic evaluation with best-metric model retention: accuracy for stage 1
  (`stage1_train.py:286-289`), SRCC of the predicted score for stage 2
  (`stage2_train.py:300-304`);
- `jax.checkpoint` (remat) on the whole loss when `grad_checkpoint` is set
  (reference `--grad_checkpoint True` + ViT ckpt default,
  `stage1_train.py:886-889`).
"""

from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from aigv_assessor_tpu.core.mesh import MeshConfig, make_mesh
from aigv_assessor_tpu.models.assessor import AIGVAssessor
from aigv_assessor_tpu.parallel.sharding import (
    make_param_shardings,
    shard_batch,
)
from aigv_assessor_tpu.train.freeze import (
    count_params,
    make_trainable_mask,
    merge_params,
    partition_params,
)

logger = logging.getLogger(__name__)


@dataclass
class TrainConfig:
    """Hyperparameters; defaults mirror `shell/train/stage1_train.sh:27-63`."""

    output_dir: str = "work_dirs/run"
    learning_rate: float = 4e-5
    weight_decay: float = 0.01
    warmup_ratio: float = 0.03
    lr_scheduler_type: str = "cosine"  # 'cosine' | 'linear' | 'constant'
    num_train_epochs: float = 50.0
    per_device_train_batch_size: int = 4
    gradient_accumulation_steps: int = 1
    max_grad_norm: float = 1.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    logging_steps: int = 1
    save_steps: int = 60
    save_total_limit: int = 1
    eval_steps: int = 0  # 0 = no periodic eval
    seed: int = 42
    grad_checkpoint: bool = True
    freeze_backbone: bool = True
    freeze_llm: bool = True
    freeze_mlp: bool = False
    # reference --unfreeze_lm_head (stage1_train.py wrap: output/tok
    # embeddings trainable even with a frozen LLM)
    unfreeze_lm_head: bool = False
    max_seq_length: int = 4096
    bf16: bool = True
    resume_from_checkpoint: Optional[str] = None
    # layer-wise LR decay (reference trainer_monkey_patch.py:61-159; env
    # VIT_LAYER_DECAY_RATE etc. override when these are None)
    vit_layer_decay_rate: Optional[float] = None
    llm_layer_decay_rate: Optional[float] = None
    llm_lr_scale: Optional[float] = None
    # eval artifacts (reference --output_file/--metrics_file,
    # stage1_train.py:73-86)
    output_file: str = "results.csv"
    metrics_file: str = "metrics.txt"
    # Store the FROZEN param partition in bf16 when the model computes in
    # bf16 (stage-1/2 freeze both towers — ~2.4B params at 2B scale).
    # Numerics-identical: the forward casts fp32 masters to bf16 anyway, so
    # keeping fp32 only doubles HBM (+4.8 GB) and weight-read bandwidth per
    # microbatch. Matches the reference, whose frozen torch modules hold
    # bf16 weights (`stage1_train.py:802-849` loads torch_dtype=bfloat16).
    frozen_bf16: bool = True


def make_schedule(cfg: TrainConfig, total_steps: int):
    warmup = int(total_steps * cfg.warmup_ratio)
    if cfg.lr_scheduler_type == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, warmup, max(total_steps, warmup + 1)
        )
    if cfg.lr_scheduler_type == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, cfg.learning_rate, max(warmup, 1)),
                optax.linear_schedule(
                    cfg.learning_rate, 0.0, max(total_steps - warmup, 1)
                ),
            ],
            [warmup],
        )
    return optax.constant_schedule(cfg.learning_rate)


def decay_mask(params) -> Any:
    """True where weight decay applies. The reference's HF Trainer excludes
    biases and LayerNorm weights from decay (`Trainer.create_optimizer`
    no_decay list); the flax equivalents are leaves named `bias`/`scale`
    and RMSNorm `weight`s (their parent module names all contain 'norm')."""

    def decay(path, leaf) -> bool:
        keys = [str(getattr(k, "key", k)) for k in path]
        name = keys[-1] if keys else ""
        if name in ("bias", "scale"):
            return False
        if name == "weight" and any("norm" in k.lower() for k in keys[:-1]):
            return False
        return True

    return jax.tree_util.tree_map_with_path(decay, params)


def make_optimizer(
    cfg: TrainConfig,
    total_steps: int,
    trainable_mask: Any,
    layer_decay: Any = None,
):
    schedule = make_schedule(cfg, total_steps)
    chain = [
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            schedule,
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.weight_decay,
            mask=decay_mask,
        ),
    ]
    if layer_decay is not None:
        from aigv_assessor_tpu.train.layer_decay import scale_by_layer_decay

        chain.append(scale_by_layer_decay(layer_decay))
    # the optimizer operates on the TRAINABLE partition only (see
    # freeze.partition_params): frozen params never enter autodiff or the
    # optimizer, so XLA drops their weight-gradient matmuls entirely and no
    # optimizer state exists for them. (An earlier optax.masked() variant
    # passed raw gradients through as updates for frozen leaves — caught by
    # the overfit probe.)
    return optax.chain(*chain)


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[]
)


class Trainer:
    def __init__(
        self,
        model: AIGVAssessor,
        params: Any,
        train_config: TrainConfig,
        total_steps: int,
        mesh: Optional[Mesh] = None,
        eval_fn: Optional[Callable[[Any, int], Dict[str, float]]] = None,
        best_metric_key: str = "accuracy",
        checkpoint_manager=None,
        on_best: Optional[Callable[[Any, int], None]] = None,
    ):
        self.model = model
        self.cfg = train_config
        self.mesh = mesh or make_mesh(MeshConfig.auto())
        self.eval_fn = eval_fn
        self.best_metric_key = best_metric_key
        self.best_metric = float("-inf")
        self.ckpt = checkpoint_manager
        # called with (params, step) on every new best metric (the reference
        # dumps bare LoRA tensors here, stage2_train.py:223-235,300-307)
        self.on_best = on_best

        self.trainable_mask = make_trainable_mask(
            params,
            model.config.stage,
            freeze_backbone=train_config.freeze_backbone,
            freeze_llm=train_config.freeze_llm,
            freeze_mlp=train_config.freeze_mlp,
            unfreeze_lm_head=train_config.unfreeze_lm_head,
        )
        if (
            train_config.frozen_bf16
            and model.precision.compute_dtype == jnp.bfloat16
        ):
            t0, f0 = partition_params(params, self.trainable_mask)
            f0 = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(jnp.result_type(x), jnp.floating)
                else x,
                f0,
            )
            params = merge_params(t0, f0)
        counts = count_params(params, self.trainable_mask)
        logger.info(
            "parameters: %.1fM total, %.1fM trainable",
            counts["total"] / 1e6,
            counts["trainable"] / 1e6,
        )
        layer_decay = None
        import os as _os

        if (
            train_config.vit_layer_decay_rate is not None
            or train_config.llm_layer_decay_rate is not None
            or train_config.llm_lr_scale is not None
            or _os.environ.get("VIT_LAYER_DECAY_RATE")
            or _os.environ.get("QLLAMA_LAYER_DECAY_RATE")
            or _os.environ.get("QLLAMA_LR_SCALE")
        ):
            from aigv_assessor_tpu.train.layer_decay import layer_decay_multipliers

            layer_decay = layer_decay_multipliers(
                params,
                model.config.vision.num_hidden_layers,
                model.config.llm.num_hidden_layers,
                train_config.vit_layer_decay_rate,
                train_config.llm_layer_decay_rate,
                train_config.llm_lr_scale,
            )
        if layer_decay is not None:
            layer_decay, _ = partition_params(layer_decay, self.trainable_mask)
        self.tx = make_optimizer(
            train_config, total_steps, self.trainable_mask, layer_decay
        )
        self.metrics_writer = None
        try:
            from aigv_assessor_tpu.utils.metrics_writer import MetricsWriter

            self.metrics_writer = MetricsWriter(
                os.path.join(train_config.output_dir, "logs")
            )
        except Exception:  # metrics writing must never kill training
            pass

        with self.mesh:
            param_shardings = make_param_shardings(params, self.mesh)
            params = jax.tree_util.tree_map(jax.device_put, params, param_shardings)
            trainable0, _ = partition_params(params, self.trainable_mask)
            opt_state = jax.jit(self.tx.init)(trainable0)
        self.state = TrainState(
            params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32)
        )
        self._compiled_step = None
        self._metrics_log = []

    # ------------------------------------------------------------- step ----

    def _loss_fn(self, params, batch, dropout_rng):
        out = self.model.apply(
            params,
            batch["input_ids"],
            batch["pixel_values"],
            attention_mask=batch.get("attention_mask"),
            labels=batch.get("labels"),
            mos=batch.get("mos"),
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        return out["loss"], out

    def _train_step(self, state: TrainState, batch, dropout_rng):
        """One optimizer step over `accum` microbatches (leading dim).

        Autodiff runs over the TRAINABLE param partition only (frozen params
        are closed-over constants -> their dW matmuls are dead code).
        Activation remat is applied inside the model (per-layer nn.remat via
        the model's `remat` flag), not here — wrapping the whole loss in
        jax.checkpoint is a no-op at the outermost boundary."""
        trainable, frozen = partition_params(state.params, self.trainable_mask)

        def loss_of_trainable(trainable, mb, rng):
            return self._loss_fn(merge_params(trainable, frozen), mb, rng)

        grad_fn = jax.value_and_grad(loss_of_trainable, has_aux=True)

        def micro(carry, mb):
            grads_acc, loss_acc, rng = carry
            rng, sub = jax.random.split(rng)
            (loss, _), grads = grad_fn(trainable, mb, sub)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss, rng), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, trainable)
        accum = jax.tree_util.tree_leaves(batch)[0].shape[0]
        (grads, loss_sum, _), _ = jax.lax.scan(
            micro, (zeros, 0.0, dropout_rng), batch
        )
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
        updates, opt_state = self.tx.update(grads, state.opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        params = merge_params(trainable, frozen)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            loss_sum / accum,
        )

    def compiled_step(self):
        if self._compiled_step is None:
            self._compiled_step = jax.jit(self._train_step, donate_argnums=(0,))
        return self._compiled_step

    # -------------------------------------------------------------- loop ---

    def train(self, data_iter_fn: Callable[[int], Any], steps_per_epoch: int):
        """data_iter_fn(epoch) -> iterator of microbatched dict batches with
        leading [accum, micro_bs, ...] dims."""
        cfg = self.cfg
        os.makedirs(cfg.output_dir, exist_ok=True)
        rng = jax.random.key(cfg.seed)
        step_fn = self.compiled_step()
        total_epochs = int(np.ceil(cfg.num_train_epochs))
        t_start = time.time()

        with self.mesh:
            for epoch in range(total_epochs):
                for batch in data_iter_fn(epoch):
                    rng, sub = jax.random.split(rng)
                    # dim0 is the (sequentially scanned) accum dim; the
                    # per-device batch dim is 1. Multi-process runs assemble
                    # globals from per-host shards (per-host data loading).
                    device_batch = shard_batch(batch, self.mesh, batch_dim=1)
                    self.state, loss = step_fn(self.state, device_batch, sub)
                    step = int(self.state.step)

                    if step % cfg.logging_steps == 0:
                        loss_v = float(loss)
                        rec = {
                            "step": step,
                            "epoch": epoch,
                            "loss": loss_v,
                            "time": time.time() - t_start,
                        }
                        self._metrics_log.append(rec)
                        logger.info("step %d loss %.4f", step, loss_v)
                        self._write_log(rec)

                    if cfg.eval_steps and step % cfg.eval_steps == 0:
                        self.maybe_eval(step)
                    if cfg.save_steps and step % cfg.save_steps == 0:
                        self.save(step)
        self.save(int(self.state.step), final=True)
        return self.state

    def maybe_eval(self, step: int):
        if self.eval_fn is None:
            return
        metrics = self.eval_fn(self.state.params, step)
        self._write_log({"step": step, **{f"eval_{k}": v for k, v in metrics.items()}})
        m = metrics.get(self.best_metric_key)
        if m is not None and m > self.best_metric:
            self.best_metric = m
            logger.info("new best %s=%.4f; saving", self.best_metric_key, m)
            self.save(step, best=True)
            if self.on_best is not None:
                self.on_best(self.state.params, step)

    def save(self, step: int, best: bool = False, final: bool = False):
        if self.ckpt is None:
            return
        self.ckpt.save(step, self.state, best=best)

    def _write_log(self, record: Dict[str, Any]):
        path = os.path.join(self.cfg.output_dir, "train_log.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self.metrics_writer is not None:
            scalars = {
                k: v for k, v in record.items()
                if isinstance(v, (int, float)) and k != "step"
            }
            self.metrics_writer.write(int(record.get("step", 0)), scalars)


def microbatch(batch_arrays: Dict[str, np.ndarray], accum: int) -> Dict[str, np.ndarray]:
    """Reshape [B, ...] -> [accum, B//accum, ...] for scan-based accumulation."""
    out = {}
    for k, v in batch_arrays.items():
        b = v.shape[0]
        assert b % accum == 0, (k, b, accum)
        out[k] = v.reshape((accum, b // accum) + v.shape[1:])
    return out
