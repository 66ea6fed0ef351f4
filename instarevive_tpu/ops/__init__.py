from instarevive_tpu.ops.resize import (  # noqa: F401
    imresize_matlab,
    pil_resize_bicubic,
    interpolate,
    resize_by_scale,
)
from instarevive_tpu.ops.filters import (  # noqa: F401
    filter2d,
    gaussian_kernel1d,
    gaussian_blur,
    usm_sharpen,
)
from instarevive_tpu.ops.color import (  # noqa: F401
    rgb_to_ycbcr,
    ycbcr_to_rgb,
    rgb2ycbcr_matlab,
    adain_color_fix,
    wavelet_color_fix,
    wavelet_blur,
    wavelet_decomposition,
)
