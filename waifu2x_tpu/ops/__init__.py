from waifu2x_tpu.ops.convstack import (  # noqa: F401
    leaky_relu,
    conv_stack_valid,
    convert_plane,
)
from waifu2x_tpu.ops.color import bgr_to_yuv, yuv_to_bgr  # noqa: F401
from waifu2x_tpu.ops.resize import resize  # noqa: F401
