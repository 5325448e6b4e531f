from aigv_assessor_tpu.models.vit import InternVisionModel  # noqa: F401
from aigv_assessor_tpu.models.internlm2 import InternLM2ForCausalLM  # noqa: F401
from aigv_assessor_tpu.models.motion import SlowFastR50  # noqa: F401
from aigv_assessor_tpu.models.assessor import AIGVAssessor  # noqa: F401
