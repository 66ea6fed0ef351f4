from instarevive_tpu.models.swinir import SwinIR  # noqa: F401
