"""Functional model zoo.

Each model family is a pure ``apply(params, x_bhwc) -> y_bhwc`` function
plus a registry entry describing its tile spec and weight schema.  See
``moephoto_tpu/models/api.py`` for the parameter convention.
"""

from moephoto_tpu.models.api import convertStateDict, loadTorchWeights  # noqa: F401
