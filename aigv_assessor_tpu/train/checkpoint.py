"""Checkpointing (orbax).

Replaces the HF Trainer checkpoint machinery the reference relies on
(`get_last_checkpoint` + `trainer.train(resume_from_checkpoint)`,
`stage1_train.py:771-783,969-975`; `--save_total_limit 1`,
`stage1_train.sh:49`) and the bare LoRA tensor dump
(`stage2_train.py:223-235` `save_lora_weights` -> 'lora_weights.pth'):

- `CheckpointManager.save/restore`: full TrainState (params + opt state +
  step) via orbax, retention-limited, plus a `best` slot for the
  best-metric model (reference `save_model` on new best,
  `stage1_train.py:286-289`);
- `save_lora_weights` / `load_lora_weights`: only the LoRA adapter leaves as
  a flat msgpack file (hot-loadable like `stage2_train.py:758-761`).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import serialization, traverse_util

from aigv_assessor_tpu.models.lora import is_lora_param_path

logger = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, directory: str, save_total_limit: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max(save_total_limit, 1), create=True
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        self._best_dir = os.path.join(self.directory, "best")

    def save(self, step: int, state: Any, best: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        if best:
            # independent single-slot best checkpoint
            ckpt = ocp.StandardCheckpointer()
            path = os.path.join(self._best_dir, "state")
            if os.path.exists(path):
                import shutil

                shutil.rmtree(path)
            ckpt.save(path, state)
            ckpt.wait_until_finished()
        logger.info("saved checkpoint step %d%s", step, " (best)" if best else "")

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, state_template: Any, step: Optional[int] = None, mesh=None
    ) -> Any:
        """Restore into the template's shardings. Pass `mesh` when resuming
        under a (multi-process) mesh: leaves the template created OFF the
        mesh — fresh scalar step counters/opt counts live uncommitted on
        local device 0 — are restored replicated over the mesh instead
        (restoring them single-device made the next train step reject the
        mixed-device state on a 2-process mesh)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        from jax.sharding import NamedSharding, PartitionSpec

        mesh_devices = (
            set(np.asarray(mesh.devices).flat) if mesh is not None else None
        )

        def to_abstract(x):
            if not isinstance(x, jax.Array):
                return x
            sharding = x.sharding
            if mesh_devices is not None and set(sharding.device_set) != mesh_devices:
                sharding = NamedSharding(mesh, PartitionSpec())
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

        template = jax.tree_util.tree_map(to_abstract, state_template)
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )

    def restore_best(self, state_template: Any) -> Any:
        ckpt = ocp.StandardCheckpointer()
        return ckpt.restore(
            os.path.join(self._best_dir, "state"), target=state_template
        )

    def close(self):
        self._mgr.close()


# --------------------------------------------------------------- raw params --


def save_params(path: str, params: Any) -> None:
    """Standalone parameter file (msgpack) for tools/export."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    params = jax.device_get(params)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


# --------------------------------------------------------------------- LoRA --


def extract_lora(params: Any) -> dict:
    """Flat {path: array} of LoRA adapter leaves."""
    flat = traverse_util.flatten_dict(params)
    return {
        "/".join(map(str, k)): np.asarray(jax.device_get(v))
        for k, v in flat.items()
        if is_lora_param_path(k)
    }


def save_lora_weights(path: str, params: Any) -> None:
    """LoRA-only artifact (reference 'lora_weights.pth',
    `stage2_train.py:223-235`)."""
    lora = extract_lora(params)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(lora))
    logger.info("saved %d LoRA tensors to %s", len(lora), path)


def load_lora_weights(path: str, params: Any) -> Any:
    """Merge a LoRA-only artifact back into a full param tree
    (reference hot-load, `stage2_train.py:758-761`)."""
    with open(path, "rb") as f:
        lora = serialization.msgpack_restore(f.read())
    flat = traverse_util.flatten_dict(params)
    for key, value in lora.items():
        k = tuple(key.split("/"))
        if k not in flat:
            raise KeyError(f"LoRA tensor {key} not present in model params")
        flat[k] = value.astype(flat[k].dtype)
    return traverse_util.unflatten_dict(flat)
