"""SlowFast-R50 motion branch in Flax (3D convs via XLA).

Re-implements the pytorchvideo `slowfast_r50` network used by the reference
motion branch (`/root/reference/internvl/model/internvl_chat/
modeling_internvl_chat.py:116-174`): stems, four residual stages with
fast-to-slow lateral fusion, and the head pooling. The reference always runs
it under `torch.no_grad()` (line 161) — here the caller wraps the output in
`jax.lax.stop_gradient` — and consumes a single 2304-d feature
(2048 slow + 256 fast) per clip.

Behavioral parity points:
- pathway packing uses `linspace(0, T-1, T//alpha)` frame picks (NOT a
  strided slice): for 8 frames the slow path sees frames {0, 7}
  (`pack_pathway_output`, lines 89-101).
- features are `repeat_interleave(alpha)`-ed on the time axis before the
  fixed AvgPool3d((8,7,7)/(32,7,7), stride 1) + adaptive mean pooling
  (lines 163-173).
- BatchNorm is inference-mode only (running stats as frozen parameters) —
  the branch is never trained.

Layout is channels-last [B, T, H, W, C] (XLA-native on TPU); the checkpoint
converter (`tools/convert_weights.py`) transposes torch's [C_out, C_in, t, h,
w] kernels.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from aigv_assessor_tpu.core.config import MotionConfig
from aigv_assessor_tpu.core.precision import Precision


class FrozenBatchNorm(nn.Module):
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x * inv.astype(x.dtype) + (bias - mean * inv).astype(x.dtype)).astype(
            x.dtype
        )


class _PointwiseConvW8A8(nn.Module):
    """(1,1,1) conv as an int8 MXU channel matmul (strides = spatial
    subsampling). Param path/shape identical to nn.Conv's kernel, so bf16
    checkpoints load unchanged; weights quantize on the fly
    (`ops/w8a8.w8a8_dynamic_matmul`) — the motion branch is frozen and
    inference-only, so no int8 export format is needed."""

    features: int
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from aigv_assessor_tpu.ops.w8a8 import w8a8_dynamic_matmul

        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, 1, cin, self.features),
            jnp.float32,
        )
        st, sh, sw = self.strides
        if (st, sh, sw) != (1, 1, 1):
            x = x[:, ::st, ::sh, ::sw]
        shape = x.shape
        y = w8a8_dynamic_matmul(
            x.reshape(-1, cin), kernel.reshape(cin, self.features),
            out_dtype=self.dtype,
        )
        return y.reshape(shape[:-1] + (self.features,))


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    use_relu: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    w8a8: bool = False  # int8-MXU pointwise convs (serving precision)

    @nn.compact
    def __call__(self, x):
        if self.w8a8 and self.kernel == (1, 1, 1):
            x = _PointwiseConvW8A8(
                self.features, self.strides, dtype=self.dtype, name="conv"
            )(x)
        else:
            pad = [(k // 2, k // 2) for k in self.kernel]
            x = nn.Conv(
                self.features,
                kernel_size=self.kernel,
                strides=self.strides,
                padding=pad,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
        x = FrozenBatchNorm(self.features, name="bn")(x)
        return nn.relu(x) if self.use_relu else x


class Bottleneck(nn.Module):
    """ResNet bottleneck with a (t,1,1) temporal conv_a, (1,3,3) spatial
    conv_b (stride on conv_b, torchvision-style as in pytorchvideo), and
    (1,1,1) conv_c; expansion 4."""

    dim_inner: int
    dim_out: int
    temporal_kernel: int = 1
    spatial_stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    w8a8: bool = False

    @nn.compact
    def __call__(self, x):
        s = self.spatial_stride
        branch = ConvBN(
            self.dim_inner, (self.temporal_kernel, 1, 1), dtype=self.dtype,
            w8a8=self.w8a8, name="conv_a",
        )(x)
        branch = ConvBN(
            self.dim_inner, (1, 3, 3), strides=(1, s, s), dtype=self.dtype,
            name="conv_b",
        )(branch)
        branch = ConvBN(
            self.dim_out, (1, 1, 1), use_relu=False, dtype=self.dtype,
            w8a8=self.w8a8, name="conv_c",
        )(branch)
        if x.shape[-1] != self.dim_out or s != 1:
            x = ConvBN(
                self.dim_out, (1, 1, 1), strides=(1, s, s), use_relu=False,
                dtype=self.dtype, w8a8=self.w8a8, name="shortcut",
            )(x)
        return nn.relu(x + branch)


class ResStage(nn.Module):
    depth: int
    dim_inner: int
    dim_out: int
    temporal_kernel: int
    spatial_stride: int
    dtype: jnp.dtype = jnp.bfloat16
    w8a8: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = Bottleneck(
                self.dim_inner,
                self.dim_out,
                self.temporal_kernel,
                self.spatial_stride if i == 0 else 1,
                dtype=self.dtype,
                w8a8=self.w8a8,
                name=f"block_{i}",
            )(x)
        return x


class PathwayStem(nn.Module):
    features: int
    temporal_kernel: int  # 1 (slow) or 5 (fast)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = ConvBN(
            self.features,
            (self.temporal_kernel, 7, 7),
            strides=(1, 2, 2),
            dtype=self.dtype,
            name="conv",
        )(x)
        # MaxPool3d((1,3,3), stride (1,2,2), pad (0,1,1))
        return nn.max_pool(
            x,
            window_shape=(1, 3, 3),
            strides=(1, 2, 2),
            padding=[(0, 0), (1, 1), (1, 1)],
        )


class FuseFastToSlow(nn.Module):
    """Lateral connection: temporal-strided conv on the fast pathway,
    concatenated onto the slow pathway."""

    fast_features: int
    alpha: int = 4
    fusion_kernel: int = 7
    ratio: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, slow, fast):
        fused = ConvBN(
            self.fast_features * self.ratio,
            (self.fusion_kernel, 1, 1),
            strides=(self.alpha, 1, 1),
            dtype=self.dtype,
            name="conv",
        )(fast)
        return jnp.concatenate([slow, fused], axis=-1), fast


def pack_pathways(frames: jnp.ndarray, alpha: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """frames [B, T, H, W, 3] -> (slow [B, T//alpha, ...], fast).

    linspace frame picks, truncated to int, matching `pack_pathway_output`
    (`modeling_internvl_chat.py:89-97`).
    """
    t = frames.shape[1]
    n_slow = max(1, t // alpha)  # guard T < alpha (the reference would crash)
    idx = np.linspace(0, t - 1, n_slow).astype(np.int64)
    return frames[:, idx], frames


def _avg_pool3d_stride1(x: jnp.ndarray, window: Tuple[int, int, int]) -> jnp.ndarray:
    """AvgPool3d(window, stride=1, VALID) on [B, T, H, W, C]."""
    w = (1, *window, 1)
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, w, (1, 1, 1, 1, 1), "VALID"
    )
    return summed / float(np.prod(window))


class SlowFastR50(nn.Module):
    config: MotionConfig = MotionConfig()
    precision: Precision = Precision()

    @nn.compact
    def __call__(self, frames: jnp.ndarray) -> jnp.ndarray:
        """frames: [B, T, H, W, 3] normalized pixels -> [B, feature_dim]."""
        cfg = self.config
        dt = self.precision.compute_dtype
        slow_in, fast_in = pack_pathways(frames.astype(dt), cfg.alpha)

        sw, fw = cfg.slow_width, cfg.fast_width
        slow = PathwayStem(sw, 1, dtype=dt, name="slow_stem")(slow_in)
        fast = PathwayStem(fw, 5, dtype=dt, name="fast_stem")(fast_in)
        slow, fast = FuseFastToSlow(
            fw, cfg.alpha, cfg.fusion_kernel, cfg.fusion_conv_ratio, dtype=dt,
            name="fuse_stem",
        )(slow, fast)

        # (depth, slow_inner, slow_out, fast_inner, fast_out,
        #  slow_temporal_kernel, spatial_stride)
        stage_specs = [
            (cfg.stage_depths[0], sw, sw * 4, fw, fw * 4, 1, 1),
            (cfg.stage_depths[1], sw * 2, sw * 8, fw * 2, fw * 8, 1, 2),
            (cfg.stage_depths[2], sw * 4, sw * 16, fw * 4, fw * 16, 3, 2),
            (cfg.stage_depths[3], sw * 8, sw * 32, fw * 8, fw * 32, 3, 2),
        ]
        for si, (depth, s_inner, s_out, f_inner, f_out, s_tk, stride) in enumerate(
            stage_specs
        ):
            slow = ResStage(
                depth, s_inner, s_out, s_tk, stride, dtype=dt,
                w8a8=self.precision.w8a8_motion, name=f"slow_res{si+2}",
            )(slow)
            fast = ResStage(
                depth, f_inner, f_out, 3, stride, dtype=dt,
                w8a8=self.precision.w8a8_motion, name=f"fast_res{si+2}",
            )(fast)
            if si < 3:  # no fusion after the last stage
                slow, fast = FuseFastToSlow(
                    f_out, cfg.alpha, cfg.fusion_kernel, cfg.fusion_conv_ratio,
                    dtype=dt, name=f"fuse_res{si+2}",
                )(slow, fast)

        # head: repeat_interleave(alpha) on T, AvgPool3d stride 1, global mean
        slow = jnp.repeat(slow, cfg.alpha, axis=1)
        fast = jnp.repeat(fast, cfg.alpha, axis=1)
        slow_win = (min(8, slow.shape[1]), min(7, slow.shape[2]), min(7, slow.shape[3]))
        fast_win = (min(32, fast.shape[1]), min(7, fast.shape[2]), min(7, fast.shape[3]))
        slow = _avg_pool3d_stride1(slow, slow_win).mean(axis=(1, 2, 3))
        fast = _avg_pool3d_stride1(fast, fast_win).mean(axis=(1, 2, 3))
        feat = jnp.concatenate([slow, fast], axis=-1)  # [B, 2048 + 256]
        return feat.astype(dt)
