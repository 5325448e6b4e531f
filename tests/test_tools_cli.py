"""Tools CLI chain smoke: the checkpoint-surgery mains operate end-to-end on
a real (tiny) parameter file."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import serialization, traverse_util

from aigv_assessor_tpu.core.config import AssessorConfig
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.models.assessor import AIGVAssessor


@pytest.fixture(scope="module")
def tiny_params_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    cfg = AssessorConfig.tiny(stage=2).replace(
        img_context_token_id=4, use_backbone_lora=2, use_llm_lora=2
    )
    model = AIGVAssessor(cfg, Precision.fp32())
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, 32), jnp.int32),
        jnp.zeros((1, 4, 56, 56, 3), jnp.float32),
        mos=jnp.zeros((1,), jnp.float32),
    )
    p = d / "params.msgpack"
    with open(p, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    return str(p), cfg


def _load(path):
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


class TestToolChain:
    def test_extract_vit_main(self, tiny_params_file, tmp_path):
        from aigv_assessor_tpu.tools import extract_vit

        src, _ = tiny_params_file
        out = str(tmp_path / "vit.msgpack")
        extract_vit.main(["--params", src, "--out", out])
        tree = _load(out)
        assert "vision_model" in tree["params"]

    def test_extract_mlp_main(self, tiny_params_file, tmp_path):
        from aigv_assessor_tpu.tools import extract_mlp

        src, _ = tiny_params_file
        out = str(tmp_path / "mlp.msgpack")
        extract_mlp.main(["--params", src, "--out", out])
        tree = _load(out)
        assert "mlp1" in tree and "motion_mlp" in tree

    def test_merge_lora_main(self, tiny_params_file, tmp_path):
        from aigv_assessor_tpu.tools import merge_lora

        src, _ = tiny_params_file
        out = str(tmp_path / "merged.msgpack")
        merge_lora.main(["--params", src, "--out", out])
        flat = traverse_util.flatten_dict(_load(out))
        assert not any("lora_a" in map(str, k) for k in flat)
        # merged kernels present
        assert any("wqkv" in map(str, k) for k in flat)

    def test_replace_llm_main(self, tiny_params_file, tmp_path):
        from aigv_assessor_tpu.tools import extract_vit, replace_llm

        src, _ = tiny_params_file
        # use the same file as the llm source (self-replacement round trip)
        out = str(tmp_path / "swapped.msgpack")
        replace_llm.main(["--params", src, "--llm_params", src, "--out", out])
        tree = _load(out)
        assert "language_model" in tree["params"]

    def test_int8_chain(self, tiny_params_file, tmp_path):
        from aigv_assessor_tpu.tools import convert_to_int8

        src, _ = tiny_params_file
        q = str(tmp_path / "int8.msgpack")
        dq = str(tmp_path / "deq.msgpack")
        convert_to_int8.main(["--params", src, "--out", q])
        convert_to_int8.main(["--params", q, "--out", dq, "--dequantize"])
        orig = traverse_util.flatten_dict(_load(src))
        back = traverse_util.flatten_dict(_load(dq))
        key = next(
            k for k in orig
            if str(k[-1]) == "kernel" and np.asarray(orig[k]).size >= 4096
        )
        np.testing.assert_allclose(
            np.asarray(back[key]), np.asarray(orig[key]), atol=0.05
        )

    def test_resize_pos_embed_main(self, tiny_params_file, tmp_path):
        from aigv_assessor_tpu.tools import resize_pos_embed

        src, cfg = tiny_params_file
        out = str(tmp_path / "resized.msgpack")
        resize_pos_embed.main(
            ["--params", src, "--old_size", "56", "--new_size", "84",
             "--patch", "14", "--out", out]
        )
        tree = _load(out)
        pe = tree["params"]["vision_model"]["embeddings"]["position_embedding"]
        assert pe.shape[1] == 1 + 36
