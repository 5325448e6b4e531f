"""Weight-converter structural tests: a synthetic torch-style state dict in
the reference's naming must convert into a tree that loads into this
framework's model (names + shapes + GQA de-interleave semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import traverse_util

from aigv_assessor_tpu.core.config import AssessorConfig
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.models.assessor import AIGVAssessor
from aigv_assessor_tpu.tools.convert_weights import convert
from aigv_assessor_tpu.tools.make_synthetic_ckpt import (
    reference_state_dict as tiny_torch_state_dict,
)


class TestConverter:
    def test_converted_tree_loads_into_model(self):
        cfg = AssessorConfig.tiny(stage=2).replace(img_context_token_id=4)
        rng = np.random.default_rng(0)
        sd = tiny_torch_state_dict(cfg, rng)
        converted = convert(sd, cfg)

        model = AIGVAssessor(cfg, Precision.fp32())
        ids = jnp.zeros((1, 32), jnp.int32)
        px = jnp.zeros((1, 4, 56, 56, 3), jnp.float32)
        template = model.init(jax.random.key(0), ids, px, mos=jnp.zeros((1,)))

        tflat = traverse_util.flatten_dict(template)
        cflat = traverse_util.flatten_dict(converted)
        # every converted leaf must exist in the model with matching shape
        # (except slowfast, not in this synthetic dict)
        for key, val in cflat.items():
            assert key in tflat, f"converted key not in model: {key}"
            assert tflat[key].shape == val.shape, (
                key, tflat[key].shape, val.shape
            )
        # and the model's non-slowfast params must be fully covered
        missing = [
            k
            for k in tflat
            if k not in cflat and "slowfast_model" not in "/".join(map(str, k))
        ]
        assert not missing, f"model params not covered: {missing[:10]}"

    def test_wqkv_deinterleave_matches_model_slicing(self):
        """End-to-end GQA layout check: torch interleaved wqkv -> converter ->
        the model's [q|k|v] slicing must recover the same per-head weights
        the reference's rearrange produces."""
        cfg = AssessorConfig.tiny(stage=1)
        l = cfg.llm
        rng = np.random.default_rng(1)
        g = l.num_key_value_groups
        w_torch = rng.normal(
            size=(l.num_key_value_heads * (g + 2) * l.head_dim, l.hidden_size)
        ).astype(np.float32)

        from aigv_assessor_tpu.tools.convert_weights import deinterleave_wqkv

        kernel = deinterleave_wqkv(
            w_torch, l.num_attention_heads, l.num_key_value_heads, l.head_dim
        ).T  # [in, out] as stored

        x = rng.normal(size=(1, 3, l.hidden_size)).astype(np.float32)
        qkv = x @ kernel
        hq, hkv, d = l.num_attention_heads, l.num_key_value_heads, l.head_dim
        q = qkv[..., : hq * d].reshape(1, 3, hq, d)
        k = qkv[..., hq * d : (hq + hkv) * d].reshape(1, 3, hkv, d)

        # reference semantics: x @ w.T, reshape (h, gs, d), q = [:, :, :g]
        ref = (x @ w_torch.T).reshape(1, 3, hkv, g + 2, d)
        ref_q = ref[:, :, :, :g, :].reshape(1, 3, hq, d)
        ref_k = ref[:, :, :, g, :]
        np.testing.assert_allclose(q, ref_q, rtol=1e-5)
        np.testing.assert_allclose(k, ref_k, rtol=1e-5)

    def test_slowfast_name_mapping(self):
        from aigv_assessor_tpu.tools.convert_weights import map_slowfast_key

        cases = {
            "slowfast_model.feature_extraction.0.multipathway_blocks.0.conv.weight":
                ("slow_stem/conv/conv/kernel", "conv"),
            "slowfast_model.feature_extraction.0.multipathway_blocks.1.norm.running_mean":
                ("fast_stem/conv/bn/mean", "plain"),
            "slowfast_model.feature_extraction.0.multipathway_fusion.conv_fast_to_slow.weight":
                ("fuse_stem/conv/conv/kernel", "conv"),
            "slowfast_model.feature_extraction.1.multipathway_blocks.0.res_blocks.2.branch2.conv_b.weight":
                ("slow_res2/block_2/conv_b/conv/kernel", "conv"),
            "slowfast_model.feature_extraction.4.multipathway_blocks.1.res_blocks.0.branch1_norm.running_var":
                ("fast_res5/block_0/shortcut/bn/var", "plain"),
        }
        for key, want in cases.items():
            assert map_slowfast_key(key) == want, key

    def test_peft_key_normalization(self):
        from aigv_assessor_tpu.tools.convert_weights import normalize_peft_keys

        sd = {
            "base_model.model.language_model.model.layers.0.attention.wqkv.base_layer.weight": np.zeros(1),
            "base_model.model.language_model.model.layers.0.attention.wqkv.lora_A.default.weight": np.zeros(1),
            "base_model.model.language_model.model.layers.0.attention.wqkv.lora_B.default.weight": np.zeros(1),
        }
        out = normalize_peft_keys(sd)
        keys = set(out)
        assert "language_model.model.layers.0.attention.wqkv.weight" in keys
        assert "language_model.model.layers.0.attention.wqkv.lora_a" in keys
        assert "language_model.model.layers.0.attention.wqkv.lora_b" in keys


def full_pytorchvideo_slowfast_keys():
    """The complete `slowfast_r50` state_dict key list as the reference's
    wrapper exposes it (`slowfast_model.feature_extraction.{0..4}`,
    `modeling_internvl_chat.py:145-157`): stem block 0, res stages 1-4 with
    (3, 4, 6, 3) bottleneck blocks, lateral fast->slow fusions after blocks
    0-3, shortcut (branch1) convs on every stage's first block. BN modules
    carry torch's 5 leaves including `num_batches_tracked`."""
    bn_leaves = ["weight", "bias", "running_mean", "running_var",
                 "num_batches_tracked"]
    keys = []

    def add_conv_bn(prefix, conv_name, norm_name):
        keys.append(f"{prefix}.{conv_name}.weight")
        keys.extend(f"{prefix}.{norm_name}.{l}" for l in bn_leaves)

    P = "slowfast_model.feature_extraction"
    for p in (0, 1):  # slow/fast stems
        add_conv_bn(f"{P}.0.multipathway_blocks.{p}", "conv", "norm")
    add_conv_bn(f"{P}.0.multipathway_fusion", "conv_fast_to_slow", "norm")
    n_blocks = {1: 3, 2: 4, 3: 6, 4: 3}
    for s, n in n_blocks.items():
        for p in (0, 1):
            for j in range(n):
                base = f"{P}.{s}.multipathway_blocks.{p}.res_blocks.{j}"
                if j == 0:
                    add_conv_bn(base, "branch1_conv", "branch1_norm")
                for br in "abc":
                    add_conv_bn(f"{base}.branch2", f"conv_{br}", f"norm_{br}")
        if s < 4:
            add_conv_bn(f"{P}.{s}.multipathway_fusion", "conv_fast_to_slow",
                        "norm")
    return keys


class TestSlowFastCoverage:
    def test_every_key_consumed_every_param_hit(self):
        """Golden-fixture coverage (VERDICT r1 #6): the full pytorchvideo key
        list maps with no unmapped keys, and the mapped targets cover every
        parameter of the Flax SlowFastR50 — so any drift in either the name
        map or the flax module tree fails here."""
        import jax
        import jax.numpy as jnp
        from flax import traverse_util

        from aigv_assessor_tpu.core.config import MotionConfig
        from aigv_assessor_tpu.models.motion import SlowFastR50
        from aigv_assessor_tpu.tools.convert_weights import map_slowfast_key

        keys = full_pytorchvideo_slowfast_keys()
        targets = set()
        for key in keys:
            tgt = map_slowfast_key(key)
            assert tgt is not None, f"unmapped slowfast key: {key}"
            path, op = tgt
            if op == "skip":
                assert key.endswith("num_batches_tracked"), key
                continue
            assert path not in targets, f"duplicate target: {path} <- {key}"
            targets.add(path)

        model = SlowFastR50(MotionConfig(), Precision.fp32())
        shapes = jax.eval_shape(
            model.init, jax.random.key(0), jnp.zeros((1, 8, 32, 32, 3))
        )
        flax_paths = {
            "/".join(map(str, k[1:]))  # strip leading 'params'
            for k in traverse_util.flatten_dict(shapes)
        }
        missing = flax_paths - targets
        assert not missing, f"flax params not covered: {sorted(missing)[:10]}"
        extra = targets - flax_paths
        assert not extra, f"mapped targets not in model: {sorted(extra)[:10]}"
