"""Stack/unstack per-layer parameter subtrees for scan-over-layers.

With `scan_layers=True` (the default) the encoder/decoder layer parameters
live under one `layers` subtree whose leaves carry a leading [num_layers]
dim. Checkpoints converted from torch (tools/convert_weights.py) and the
reference's per-layer surgery tools use the unrolled `layers_{i}` naming.
These two helpers convert between the formats; they are inverses.

Both operate on nested-dict param trees (flax's native format) and convert
every module level that contains `layers_{i}` children (vision tower and
LLM alike), so a whole AIGVAssessor tree converts in one call.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

_LAYER_RE = re.compile(r"^layers_(\d+)$")


def _is_dict(x) -> bool:
    return isinstance(x, dict)


def stack_layer_params(tree: Any) -> Any:
    """{... 'layers_0': T0, 'layers_1': T1 ...} -> {... 'layers': stacked}."""
    if not _is_dict(tree):
        return tree
    idx = {}
    rest: Dict[str, Any] = {}
    for key, val in tree.items():
        m = _LAYER_RE.match(str(key))
        if m:
            idx[int(m.group(1))] = stack_layer_params(val)
        else:
            rest[key] = stack_layer_params(val)
    if idx:
        n = max(idx) + 1
        missing = [i for i in range(n) if i not in idx]
        if missing:
            raise ValueError(f"missing layer indices {missing} while stacking")
        subtrees = [idx[i] for i in range(n)]

        def stack_leaves(*leaves):
            return jnp.stack([jnp.asarray(l) for l in leaves], axis=0)

        import jax

        rest["layers"] = jax.tree_util.tree_map(stack_leaves, *subtrees)
    return rest


def unstack_layer_params(tree: Any) -> Any:
    """{... 'layers': stacked} -> {... 'layers_0': T0, ...} (inverse)."""
    if not _is_dict(tree):
        return tree
    out: Dict[str, Any] = {}
    for key, val in tree.items():
        if str(key) == "layers" and _is_dict(val):
            import jax

            leaves = jax.tree_util.tree_leaves(val)
            if not leaves:
                out[key] = val
                continue
            n = int(np.asarray(leaves[0]).shape[0])
            for i in range(n):
                out[f"layers_{i}"] = jax.tree_util.tree_map(
                    lambda l: jnp.asarray(l)[i], val
                )
        else:
            out[key] = unstack_layer_params(val)
    return out


def has_stacked_layers(tree: Any) -> bool:
    if not _is_dict(tree):
        return False
    if "layers" in tree:
        return True
    return any(has_stacked_layers(v) for v in tree.values() if _is_dict(v))


def has_unrolled_layers(tree: Any) -> bool:
    if not _is_dict(tree):
        return False
    if any(_LAYER_RE.match(str(k)) for k in tree):
        return True
    return any(has_unrolled_layers(v) for v in tree.values() if _is_dict(v))
