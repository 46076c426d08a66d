from moephoto_tpu.ops.lut import ailutTransform  # noqa: F401
from moephoto_tpu.ops.warp import backWarp, gridSample  # noqa: F401
