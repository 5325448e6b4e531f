"""Golden-value unit tests for the low-level ops (SURVEY.md §4: pixel-shuffle,
splice mask, RoPE, norms need per-kernel goldens)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aigv_assessor_tpu.ops.norms import layer_norm, rms_norm
from aigv_assessor_tpu.ops.pixel_shuffle import pixel_shuffle
from aigv_assessor_tpu.ops.rope import apply_rope, ntk_scaled_base, rope_cos_sin, rotate_half
from aigv_assessor_tpu.ops.splice import splice_image_embeds


class TestNorms:
    def test_rms_norm_matches_numpy(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 5, 16)).astype(np.float32)
        w = rng.normal(size=(16,)).astype(np.float32)
        got = rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6)
        var = (x.astype(np.float64) ** 2).mean(-1, keepdims=True)
        want = w * (x / np.sqrt(var + 1e-6))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    def test_rms_norm_bf16_stats_in_fp32(self):
        # large-magnitude bf16 input would overflow bf16 variance; fp32 stats keep it finite
        x = jnp.full((1, 4, 8), 200.0, jnp.bfloat16)
        w = jnp.ones((8,), jnp.float32)
        out = rms_norm(x, w)
        assert out.dtype == jnp.bfloat16
        assert np.all(np.isfinite(np.asarray(out, np.float32)))
        np.testing.assert_allclose(np.asarray(out, np.float32), 1.0, atol=0.02)

    def test_layer_norm_matches_numpy(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(3, 7, 12)).astype(np.float32)
        w = rng.normal(size=(12,)).astype(np.float32)
        b = rng.normal(size=(12,)).astype(np.float32)
        got = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-6)
        mean = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        want = (x - mean) / np.sqrt(var + 1e-6) * w + b
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


class TestPixelShuffle:
    def _reference_pixel_shuffle(self, x, scale, v2=True):
        """Independent numpy re-derivation of the reference view/permute chain
        (`modeling_internvl_chat.py:374-388`)."""
        n, w, h, c = x.shape
        x = x.reshape(n, w, int(h * scale), int(c / scale))
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(n, int(h * scale), int(w * scale), int(c / scale**2))
        if v2:
            x = x.transpose(0, 2, 1, 3)
        return x

    @pytest.mark.parametrize("v", ["v1", "v2"])
    def test_matches_reference_math(self, v):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
        got = pixel_shuffle(jnp.asarray(x), 0.5, ps_version=v)
        want = self._reference_pixel_shuffle(x, 0.5, v2=(v == "v2"))
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_token_count_448(self):
        # (448/14)^2 = 1024 tokens -> 256 tokens x 4C after 0.5 shuffle
        x = jnp.zeros((1, 32, 32, 64))
        out = pixel_shuffle(x, 0.5)
        assert out.shape == (1, 16, 16, 256)


class TestRope:
    def test_ntk_base_below_threshold_unchanged(self):
        assert ntk_scaled_base(1e6, 128, 4096, 32768, 2.0) == 1e6

    def test_ntk_base_above_threshold(self):
        # formula from reference modeling_internlm2.py:230-236
        base = ntk_scaled_base(1e6, 128, 65536, 32768, 2.0)
        want = 1e6 * ((2.0 * 65536 / 32768) - 1.0) ** (128 / 126)
        assert np.isclose(base, want)

    def test_rotation_preserves_norm(self):
        cos, sin = rope_cos_sin(16, 8, base=10000.0, scaling_type=None)
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.normal(size=(1, 16, 2, 8)).astype(np.float32))
        k = q
        pos = jnp.arange(16)[None, :]
        qr, kr = apply_rope(q, k, cos, sin, pos)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(qr), axis=-1),
            np.linalg.norm(np.asarray(q), axis=-1),
            rtol=1e-5,
        )

    def test_relative_property(self):
        """q_m . k_n depends only on (m - n)."""
        cos, sin = rope_cos_sin(32, 8, base=10000.0, scaling_type=None)
        rng = np.random.default_rng(4)
        qv = rng.normal(size=(8,)).astype(np.float32)
        kv = rng.normal(size=(8,)).astype(np.float32)

        def dot_at(m, n):
            q = jnp.asarray(qv)[None, None, None, :]
            k = jnp.asarray(kv)[None, None, None, :]
            qm, _ = apply_rope(q, q, cos, sin, jnp.array([[m]]))
            _, kn = apply_rope(k, k, cos, sin, jnp.array([[n]]))
            return float(jnp.sum(qm * kn))

        assert np.isclose(dot_at(5, 3), dot_at(10, 8), atol=1e-4)
        assert not np.isclose(dot_at(5, 3), dot_at(5, 4), atol=1e-4)

    def test_rotate_half_layout(self):
        x = jnp.asarray(np.arange(8, dtype=np.float32))
        out = np.asarray(rotate_half(x))
        np.testing.assert_array_equal(out, np.array([-4, -5, -6, -7, 0, 1, 2, 3], np.float32))


class TestSplice:
    def test_vit_and_motion_placement(self):
        """Reproduces the reference cumsum trick semantics
        (`modeling_internvl_chat.py:292-328`): last ctx slot per sample gets
        the motion embed, earlier ones get ViT rows in order."""
        ctx = 9
        b, n, c = 2, 10, 4
        ids = np.full((b, n), 7, np.int32)
        ids[0, 2:7] = ctx  # 5 slots: 4 vit + 1 motion
        ids[1, 1:6] = ctx
        embeds = np.zeros((b, n, c), np.float32)
        vit = np.stack(
            [np.arange(4 * c).reshape(4, c), 100 + np.arange(4 * c).reshape(4, c)]
        ).astype(np.float32)
        motion = np.array([[5.0] * c, [6.0] * c], np.float32)

        out = np.asarray(
            splice_image_embeds(
                jnp.asarray(embeds), jnp.asarray(ids), jnp.asarray(vit), ctx,
                jnp.asarray(motion),
            )
        )
        np.testing.assert_array_equal(out[0, 2:6], vit[0])
        np.testing.assert_array_equal(out[0, 6], motion[0])
        np.testing.assert_array_equal(out[1, 1:5], vit[1])
        np.testing.assert_array_equal(out[1, 5], motion[1])
        # non-ctx positions untouched
        np.testing.assert_array_equal(out[0, 0], embeds[0, 0])
        np.testing.assert_array_equal(out[0, 7:], embeds[0, 7:])

    def test_no_motion_generate_path(self):
        ctx = 3
        ids = np.array([[1, 3, 3, 2]], np.int32)
        embeds = np.ones((1, 4, 2), np.float32) * 9
        vit = np.array([[[1, 2], [3, 4]]], np.float32)
        out = np.asarray(
            splice_image_embeds(jnp.asarray(embeds), jnp.asarray(ids), jnp.asarray(vit), ctx)
        )
        np.testing.assert_array_equal(out[0, 1], [1, 2])
        np.testing.assert_array_equal(out[0, 2], [3, 4])
        np.testing.assert_array_equal(out[0, 0], [9, 9])

    def test_jit_compatible(self):
        f = jax.jit(lambda e, i, v, m: splice_image_embeds(e, i, v, 3, m))
        out = f(
            jnp.zeros((1, 4, 2)),
            jnp.array([[3, 3, 0, 0]]),
            jnp.ones((1, 1, 2)),
            jnp.full((1, 2), 2.0),
        )
        assert out.shape == (1, 4, 2)


class TestDevicePreprocess:
    def test_resize_normalize_matches_host_stats(self):
        from aigv_assessor_tpu.ops.preprocess import resize_normalize

        rng = np.random.default_rng(0)
        raw = rng.integers(0, 256, (2, 3, 40, 60, 3)).astype(np.uint8)
        out = resize_normalize(jnp.asarray(raw), size=32, dtype=jnp.float32)
        assert out.shape == (2, 3, 32, 32, 3)
        # a mid-gray image must land near the normalized imagenet-mean value
        gray = np.full((1, 8, 8, 3), 124, np.uint8)
        g = np.asarray(resize_normalize(jnp.asarray(gray), size=8, dtype=jnp.float32))
        want = (124 / 255.0 - 0.485) / 0.229
        np.testing.assert_allclose(g[..., 0].mean(), want, atol=1e-2)

    def test_close_to_pil_path(self):
        """Device bicubic vs PIL bicubic: same image, small tolerance."""
        from PIL import Image
        from aigv_assessor_tpu.ops.preprocess import resize_normalize
        from aigv_assessor_tpu.data.video import transform_frames

        rng = np.random.default_rng(1)
        raw = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
        img = Image.fromarray(raw)
        host = transform_frames([img], input_size=32)[0]
        dev = np.asarray(
            resize_normalize(jnp.asarray(raw[None]), size=32, dtype=jnp.float32)
        )[0]
        # random noise is the worst case for resampling differences; just
        # bound the mean deviation
        assert np.abs(host - dev).mean() < 0.5
