from instarevive_tpu.utils import prng  # noqa: F401
