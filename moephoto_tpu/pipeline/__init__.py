from moephoto_tpu.pipeline.steps import genProcess  # noqa: F401
