from moephoto_tpu.engine.tiling import TileSpec, tiledApply  # noqa: F401
from moephoto_tpu.engine.executor import ModelExec  # noqa: F401
