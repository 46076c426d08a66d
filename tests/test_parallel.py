"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest


def _devices(n):
    import jax

    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices")
    return devs[:n]


def test_halo_exchange_matches_single_device():
    """Sharded blur over row-shards == single-device blur."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from moephoto_tpu.parallel.mesh import makeMesh
    from moephoto_tpu.parallel.sharded import shardedTiledForward

    devs = _devices(8)
    mesh = makeMesh([2, 4], ("dp", "sp"), devs)

    def blur(params, x):
        c = x.shape[-1]
        k = jnp.ones((3, 3, 1, c), x.dtype) / 9.0
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn, feature_group_count=c
        )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 16, 4).astype(np.float32))
    fwd = shardedTiledForward(blur, mesh, halo=4, scale=1)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", "sp", None, None)))
    with mesh:
        out = np.asarray(jax.jit(fwd)({}, xs))
    ref = np.asarray(blur({}, x))
    # interior exact; the shard edges at the global border use reflect
    # padding vs the single-device zero pad, so compare interior rows
    np.testing.assert_allclose(out[:, 1:-1], ref[:, 1:-1], atol=1e-5)


def test_sharded_train_step_runs_and_descends():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from moephoto_tpu.parallel.mesh import makeMesh
    from moephoto_tpu.parallel.sharded import makeShardedTrainStep

    import __graft_entry__ as GE
    from moephoto_tpu.models.sr import moeNetLite2x2

    devs = _devices(8)
    mesh = makeMesh([2, 4], ("dp", "sp"), devs)
    params = GE._lite2Params(2, seed=0)
    step = makeShardedTrainStep(moeNetLite2x2, mesh, halo=8, scale=2, lr=1e-3)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 4 * 32, 64, 1).astype(np.float32))
    y = jnp.asarray(rng.rand(4, 4 * 64, 128, 1).astype(np.float32))
    sh = NamedSharding(mesh, P("dp", "sp", None, None))
    xs = jax.device_put(x, sh)
    ys = jax.device_put(y, sh)
    with mesh:
        p1, l1 = step(params, xs, ys)
        p2, l2 = step(p1, xs, ys)
        p3, l3 = step(p2, xs, ys)
    assert np.isfinite(float(l1))
    assert float(l3) < float(l1)  # loss decreases on the same batch
