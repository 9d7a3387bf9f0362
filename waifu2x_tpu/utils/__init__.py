from waifu2x_tpu.utils.metrics import psnr  # noqa: F401
from waifu2x_tpu.utils.logging import get_logger  # noqa: F401
