"""Shared loader for the reference's own torch modeling code (oracles).

The parity tests import `/root/reference/internvl/model/...` modules
directly and diff this repo's forward passes against them — the strongest
correctness evidence obtainable in this environment (no real weights or
vocab files are present, but the reference's MODEL MATH is runnable torch).
Heavy CUDA-only deps are stubbed:

- `timm.models.layers.DropPath` -> identity (tests run drop_path_rate=0 in
  eval mode, where timm's DropPath is also the identity)
- `pytorchvideo.models.hub.slowfast_r50` -> never called (tests replace the
  reference's `slowfast` wrapper class with a deterministic feature source
  and inject the SAME features into this repo's model)
- flash-attn / apex are already import-guarded by the reference itself.
"""

from __future__ import annotations

import importlib
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub(name, **attrs):
    import importlib.machinery as im

    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__spec__ = im.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_stubs():
    import torch.nn as nn

    class DropPath(nn.Module):
        """timm DropPath; identity in eval / at drop_prob=0 (all tests)."""

        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            assert not self.training and not self.drop_prob, (
                "oracle stub only covers eval-mode/zero-rate DropPath"
            )
            return x

    timm = _stub("timm")
    models = _stub("timm.models")
    layers = _stub("timm.models.layers", DropPath=DropPath)
    timm.models = models
    models.layers = layers

    def _no_hub(*a, **k):  # pragma: no cover - guarded by class replacement
        raise RuntimeError("pytorchvideo hub is stubbed; replace `slowfast`")

    ptv = _stub("pytorchvideo")
    ptv_models = _stub("pytorchvideo.models")
    hub = _stub("pytorchvideo.models.hub", slowfast_r50=_no_hub)
    ptv.models = ptv_models
    ptv_models.hub = hub


def import_reference_module(dotted: str):
    """Import e.g. 'internvl.model.internvl_chat.modeling_intern_vit' from
    the read-only reference tree with stubs installed."""
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return importlib.import_module(dotted)


def patch_distributed_rank():
    """The reference forwards call torch.distributed.get_rank() for debug
    prints; single-process tests patch it to a non-zero rank (prints off)."""
    import torch.distributed as dist

    if not hasattr(dist, "_aigv_orig_get_rank"):
        dist._aigv_orig_get_rank = dist.get_rank
        dist.get_rank = lambda *a, **k: 1


HARDCODED_CONFIG_PATH = (
    "/DATA/DATA1/wjr/intern/InternVL/internvl_chat/internvl/model/"
    "internvl_chat_stage2/config.json"
)


class fake_hardcoded_config:
    """The reference's InternVLChatConfig.__init__ unconditionally re-loads
    llm_config/vision_config from a hard-coded absolute path
    (`configuration_internvl_chat.py:43-46` — a bug SURVEY §5 flags; our
    config does not replicate it). To INSTANTIATE the reference composite
    model at all, intercept open() on that exact path and serve the test's
    config JSON through it."""

    def __init__(self, payload: dict):
        self.payload = payload

    def __enter__(self):
        import builtins
        import io
        import json

        self._orig_open = builtins.open
        payload = json.dumps(self.payload)
        orig = self._orig_open

        def patched(file, *a, **k):
            if file == HARDCODED_CONFIG_PATH:
                return io.StringIO(payload)
            return orig(file, *a, **k)

        builtins.open = patched
        return self

    def __exit__(self, *exc):
        import builtins

        builtins.open = self._orig_open
        return False


def torch_sd_to_numpy(model, prefix: str = "") -> dict:
    import numpy as np

    return {
        f"{prefix}{k}": v.detach().cpu().numpy()
        for k, v in model.state_dict().items()
    }
