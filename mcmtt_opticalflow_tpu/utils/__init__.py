from mcmtt_opticalflow_tpu.utils.timing import StageTimer, profile_trace  # noqa: F401
from mcmtt_opticalflow_tpu.utils.logging import get_logger, FrameLog  # noqa: F401
from mcmtt_opticalflow_tpu.utils.colors import generate_colors  # noqa: F401
