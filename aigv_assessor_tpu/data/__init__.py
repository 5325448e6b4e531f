from aigv_assessor_tpu.data.constants import (  # noqa: F401
    IMG_CONTEXT_TOKEN,
    IMG_END_TOKEN,
    IMG_START_TOKEN,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from aigv_assessor_tpu.data.conversation import Conversation, get_conv_template  # noqa: F401
