from instarevive_tpu.convert.torch_import import (  # noqa: F401
    conv_kernel,
    dense_kernel,
    strip_prefixes,
    swinir_params_from_torch,
)
