"""Checkpoint/data tool tests."""

import json

import numpy as np
import pytest
from flax import serialization, traverse_util

from aigv_assessor_tpu.tools.convert_to_int8 import (
    dequantize_tree,
    quantize_kernel,
    quantize_tree,
)
from aigv_assessor_tpu.tools.convert_weights import deinterleave_wqkv
from aigv_assessor_tpu.tools.merge_lora import merge_lora_tree
from aigv_assessor_tpu.tools.resize_pos_embed import resize_pos_embed


class TestDeinterleave:
    def test_roundtrip_against_manual_gather(self):
        """De-interleaved [q|k|v] rows must reproduce the reference's
        per-group slicing (modeling_internlm2.py:375-385)."""
        hq, hkv, d, in_dim = 8, 2, 4, 6
        g = hq // hkv
        rng = np.random.default_rng(0)
        w = rng.normal(size=(hkv * (g + 2) * d, in_dim)).astype(np.float32)
        out = deinterleave_wqkv(w, hq, hkv, d)
        assert out.shape == w.shape
        w4 = w.reshape(hkv, g + 2, d, in_dim)
        # q heads: groups 0..g-1 of each kv group, in order
        np.testing.assert_array_equal(
            out[: hq * d].reshape(hkv, g, d, in_dim), w4[:, :g]
        )
        np.testing.assert_array_equal(
            out[hq * d : (hq + hkv) * d].reshape(hkv, d, in_dim), w4[:, g]
        )
        np.testing.assert_array_equal(
            out[(hq + hkv) * d :].reshape(hkv, d, in_dim), w4[:, g + 1]
        )


class TestMergeLora:
    def test_merge_matches_explicit(self):
        rng = np.random.default_rng(1)
        base = rng.normal(size=(8, 6)).astype(np.float32)
        a = rng.normal(size=(8, 2)).astype(np.float32)
        b = rng.normal(size=(2, 6)).astype(np.float32)
        params = {
            "layer": {"wqkv": {"base": {"kernel": base}, "lora_a": a, "lora_b": b}}
        }
        merged = merge_lora_tree(params, 0, 0)
        flat = traverse_util.flatten_dict(merged)
        assert ("layer", "wqkv", "lora_a") not in flat
        want = base + (a @ b) * 2.0  # alpha = 2r -> scaling 2
        np.testing.assert_allclose(
            flat[("layer", "wqkv", "base", "kernel")], want, rtol=1e-6
        )


class TestInt8:
    def test_quantize_roundtrip_error_bounded(self):
        rng = np.random.default_rng(2)
        w = rng.normal(size=(128, 64)).astype(np.float32)
        q, scale = quantize_kernel(w)
        assert q.dtype == np.int8
        deq = q.astype(np.float32) * scale[None, :]
        err = np.abs(deq - w).max()
        assert err <= np.abs(w).max() / 127.0 + 1e-6

    def test_tree_roundtrip(self):
        rng = np.random.default_rng(3)
        params = {
            "a": {"kernel": rng.normal(size=(128, 64)).astype(np.float32)},
            "b": {"bias": rng.normal(size=(64,)).astype(np.float32)},
        }
        qt = quantize_tree(params, min_size=10, scope="")
        flat = traverse_util.flatten_dict(qt)
        assert ("a", "kernel_int8") in flat and ("b", "bias") in flat
        back = dequantize_tree(qt)
        bflat = traverse_util.flatten_dict(back)
        assert ("a", "kernel") in bflat
        np.testing.assert_allclose(
            bflat[("a", "kernel")], params["a"]["kernel"], atol=0.05
        )


class TestResizePosEmbed:
    def test_shapes_and_cls_preserved(self):
        rng = np.random.default_rng(4)
        pe = rng.normal(size=(1, 1 + 16, 8)).astype(np.float32)  # 4x4 grid
        out = resize_pos_embed(pe, old_size=56, new_size=84, patch_size=14)
        assert out.shape == (1, 1 + 36, 8)
        np.testing.assert_array_equal(out[:, 0], pe[:, 0])


class TestDataTools:
    def test_json2jsonl_strips_system(self, tmp_path):
        from aigv_assessor_tpu.tools import json2jsonl

        src = tmp_path / "a.json"
        dst = tmp_path / "a.jsonl"
        rows = [
            {
                "conversations": [
                    {"from": "system", "value": "sys"},
                    {"from": "human", "value": "q"},
                    {"from": "gpt", "value": "a"},
                ]
            }
        ]
        src.write_text(json.dumps(rows))
        json2jsonl.main([str(src), str(dst)])
        out = [json.loads(l) for l in dst.read_text().splitlines()]
        assert out[0]["conversations"][0]["from"] == "human"
        assert out[0]["id"] == 0


class TestLayerDecay:
    def test_multiplier_structure(self):
        from aigv_assessor_tpu.train.layer_decay import layer_decay_multipliers

        params = {
            "params": {
                "vision_model": {
                    "embeddings": {"x": np.zeros(1)},
                    "layers_0": {"w": np.zeros(1)},
                    "layers_3": {"w": np.zeros(1)},
                },
                "mlp1": {"k": np.zeros(1)},
            }
        }
        mult = layer_decay_multipliers(
            params, num_vit_layers=4, num_llm_layers=2, vit_decay_rate=0.9,
            llm_decay_rate=1.0, llm_lr_scale=1.0,
        )
        m = mult["params"]["vision_model"]
        # deeper layers get higher multiplier (less decay)
        assert m["layers_3"]["w"] > m["layers_0"]["w"] > m["embeddings"]["x"]
        assert mult["params"]["mlp1"]["k"] == 1.0
