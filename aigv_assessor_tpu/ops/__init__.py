from aigv_assessor_tpu.ops.attention import multi_head_attention  # noqa: F401
from aigv_assessor_tpu.ops.norms import layer_norm, rms_norm  # noqa: F401
from aigv_assessor_tpu.ops.pixel_shuffle import pixel_shuffle  # noqa: F401
from aigv_assessor_tpu.ops.rope import (  # noqa: F401
    apply_rope,
    rope_cos_sin,
)
from aigv_assessor_tpu.ops.splice import splice_image_embeds  # noqa: F401
