from moephoto_tpu.parallel.mesh import makeMesh  # noqa: F401
from moephoto_tpu.parallel.sharded import (  # noqa: F401
    haloExchange,
    makeShardedTrainStep,
    shardedTiledForward,
)
