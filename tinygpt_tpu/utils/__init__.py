from tinygpt_tpu.utils.logging import get_logger
from tinygpt_tpu.utils.timer import Timer

__all__ = ["get_logger", "Timer"]
