from instarevive_tpu.data.realesrgan import (  # noqa: F401
    RealESRGANDegradationConfig,
    degrade_batch,
    sample_batch_kernels,
)
