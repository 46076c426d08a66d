import os
import sys

# Virtual 8-device CPU mesh for sharding tests; must be set before jax
# imports.  The TPU (axon) plugin may still own the default backend; CPU
# devices remain available for deterministic parity tests.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

# Parity/golden tests read reference checkpoints; the runtime consults a
# reference checkout only when this explicit dev flag is set.
if os.path.isdir("/root/reference"):
    os.environ.setdefault("MOEPHOTO_REFERENCE_ROOT", "/root/reference")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _precision():
    """Parity tests compare fp32 against torch: force exact MXU passes."""
    from moephoto_tpu.config import config
    from moephoto_tpu.models.api import setPrecision

    setPrecision("highest")
    config.bf16 = False  # parity tests compare fp32 against torch
    yield


@pytest.fixture(autouse=True)
def _cpu_device():
    """Run tests on the host CPU backend: deterministic numerics and much
    faster compiles than the tunneled TPU; TPU execution is covered by
    bench.py and the driver's compile checks."""
    import jax

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        yield


REFERENCE = "/root/reference"


def hasReference():
    return os.path.isdir(REFERENCE)


def referenceModels():
    return os.path.join(REFERENCE, "model")


needsReference = pytest.mark.skipif(
    not hasReference(), reason="reference checkout not available"
)
