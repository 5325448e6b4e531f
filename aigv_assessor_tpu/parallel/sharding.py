"""Parameter & activation sharding rules (GSPMD).

TPU-native replacement for the reference's distributed stack — DDP gradient
all-reduce + DeepSpeed ZeRO-1 optimizer-state sharding
(`/root/reference/shell/train/stage1_train.sh:62`,
`internvl/dist_utils.py:45-51`) and the naive inference pipeline split
(`internvl/model/__init__.py:8-29`). Here every parameter carries a
`NamedSharding` over the (data, fsdp, tensor) mesh and XLA inserts the
all-gather / reduce-scatter / psum collectives over ICI:

- `fsdp` axis: parameters and optimizer state sharded (ZeRO-3-style; the
  reference only reached ZeRO-1);
- `tensor` axis: Megatron-style intra-layer sharding of attention heads and
  FFN (the reference has no TP at all, SURVEY.md §2b) — column-parallel for
  wqkv/w1/w3/fc1, row-parallel for wo/w2/fc2/proj;
- `data` axis: pure replication; batches are sharded over (data, fsdp).

Rules are path-pattern based and divisibility-guarded: an axis is dropped
from the spec whenever the dimension is not divisible by the mesh axis size,
so tiny test configs and odd vocab sizes (92553) degrade gracefully to
replication instead of erroring.
"""

from __future__ import annotations

import re
from typing import Any, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from aigv_assessor_tpu.core.mesh import DATA_AXIS, FSDP_AXIS, TENSOR_AXIS

# (path regex, spec builder taking ndim) — first match wins. Specs name the
# role of each dim; `None` means replicated on that dim.
_COLUMN = PartitionSpec(FSDP_AXIS, TENSOR_AXIS)  # [in, out]: out split over TP
_ROW = PartitionSpec(TENSOR_AXIS, FSDP_AXIS)  # [in, out]: in split over TP

_RULES: Tuple[Tuple[str, PartitionSpec], ...] = (
    # ---- InternLM2 ----
    (r"wqkv/.*kernel$", _COLUMN),
    (r"wo/.*kernel$", _ROW),
    (r"feed_forward/w1/.*kernel$", _COLUMN),
    (r"feed_forward/w3/.*kernel$", _COLUMN),
    (r"feed_forward/w2/.*kernel$", _ROW),
    (r"tok_embeddings/embedding$", PartitionSpec(None, FSDP_AXIS)),
    (r"output/kernel$", PartitionSpec(FSDP_AXIS, TENSOR_AXIS)),
    # ---- ViT ----
    (r"attn/qkv/.*kernel$", _COLUMN),
    (r"attn/proj/.*kernel$", _ROW),
    (r"mlp/fc1/.*kernel$", _COLUMN),
    (r"mlp/fc2/.*kernel$", _ROW),
    (r"patch_embedding/kernel$", PartitionSpec(None, None, None, FSDP_AXIS)),
    (r"position_embedding$", PartitionSpec(None, None, FSDP_AXIS)),
    # ---- projectors / heads ----
    (r"mlp1/.*kernel$", PartitionSpec(FSDP_AXIS, None)),
    (r"motion_mlp/.*kernel$", PartitionSpec(FSDP_AXIS, None)),
    (r"mlpscore/.*kernel$", PartitionSpec(FSDP_AXIS, None)),
    # ---- LoRA adapters (small; shard the big dim over fsdp) ----
    (r"lora_a$", PartitionSpec(FSDP_AXIS, None)),
    (r"lora_b$", PartitionSpec(None, FSDP_AXIS)),
    # ---- motion conv kernels: shard output channels ----
    (r"slowfast_model/.*conv/kernel$", PartitionSpec(None, None, None, None, FSDP_AXIS)),
)


def _guard(spec: PartitionSpec, shape: Tuple[int, ...], mesh: Mesh) -> PartitionSpec:
    """Drop axes whose dim is not divisible by the mesh axis size."""
    if len(spec) > len(shape):
        return PartitionSpec()
    out = []
    for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axis is None:
            out.append(None)
            continue
        size = int(np.prod([mesh.shape[a] for a in (axis if isinstance(axis, tuple) else (axis,))]))
        out.append(axis if size > 1 and dim % size == 0 else None)
    return PartitionSpec(*out)


def param_spec(path: str, shape: Tuple[int, ...], mesh: Mesh) -> PartitionSpec:
    # scan-over-layers params live under `.../layers/...` with a leading
    # [num_layers] dim: apply the per-layer rule to the trailing dims
    stacked = re.search(r"/layers/", path) is not None
    for pattern, spec in _RULES:
        if re.search(pattern, path):
            if stacked:
                spec = PartitionSpec(None, *spec)
            return _guard(spec, shape, mesh)
    # default: FSDP-shard the largest divisible dim of >=2D params
    # (excluding the stacked layer dim)
    first = 1 if stacked else 0
    if len(shape) - first >= 2:
        fsdp = mesh.shape.get(FSDP_AXIS, 1)
        if fsdp > 1:
            order = sorted(range(first, len(shape)), key=lambda i: -shape[i])
            for dim in order:
                if shape[dim] % fsdp == 0 and shape[dim] >= fsdp:
                    spec = [None] * len(shape)
                    spec[dim] = FSDP_AXIS
                    return PartitionSpec(*spec)
    return PartitionSpec()


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def make_param_shardings(params: Any, mesh: Mesh) -> Any:
    """Tree of NamedShardings matching `params`' structure."""

    def one(path, leaf):
        return NamedSharding(mesh, param_spec(_path_str(path), leaf.shape, mesh))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """device_put the parameter tree with its sharding rules."""
    shardings = make_param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_batch(
    batch: Any,
    mesh: Mesh,
    *,
    batch_dim: int = 0,
    process_local: bool = None,
) -> Any:
    """Shard array leaves' batch dim over (data, fsdp).

    batch_dim: which dim is the per-step batch (1 for the trainer's
    [accum, micro_bs, ...] microbatched layout — the accum dim is scanned
    sequentially and must stay unsharded).

    process_local: each host holds only ITS shard of the global batch
    (per-host sharded data loading, SURVEY §2b; the loaders cut per-process
    index shards via ShardedBatchSampler). Global arrays are assembled with
    `jax.make_array_from_process_local_data`, so no host ever materializes
    the full global batch. Defaults to True when jax runs multi-process.
    """
    if process_local is None:
        process_local = jax.process_count() > 1
    procs = jax.process_count() if process_local else 1
    n = mesh.shape[DATA_AXIS] * mesh.shape[FSDP_AXIS]

    def one(leaf):
        arr = np.asarray(leaf)
        spec = [None] * arr.ndim
        if arr.ndim > batch_dim:
            global_rows = arr.shape[batch_dim] * procs
            if global_rows % n == 0 and global_rows >= n:
                spec[batch_dim] = (DATA_AXIS, FSDP_AXIS)
        sharding = NamedSharding(mesh, PartitionSpec(*spec))
        if process_local:
            return jax.make_array_from_process_local_data(sharding, arr)
        return jax.device_put(arr, sharding)

    return jax.tree_util.tree_map(one, batch)
