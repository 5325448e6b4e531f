from aigv_assessor_tpu.utils.logging_utils import setup_logging  # noqa: F401
from aigv_assessor_tpu.utils.metrics_writer import MetricsWriter  # noqa: F401
from aigv_assessor_tpu.utils.profiling import StepTimer, trace  # noqa: F401
