from moephoto_tpu.utils import imageio  # noqa: F401
