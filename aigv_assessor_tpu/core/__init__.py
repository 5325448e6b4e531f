from aigv_assessor_tpu.core.config import (  # noqa: F401
    AssessorConfig,
    LLMConfig,
    MotionConfig,
    VisionConfig,
)
from aigv_assessor_tpu.core.mesh import MeshConfig, make_mesh  # noqa: F401
from aigv_assessor_tpu.core.precision import Precision  # noqa: F401
