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
from instarevive_tpu.ops.diffjpeg import jpeg_compress_decompress  # noqa: F401
from instarevive_tpu.ops.degradation import (  # noqa: F401
    KernelConfig,
    circular_lowpass_kernel,
    random_add_gaussian_noise,
    random_add_poisson_noise,
    sample_final_sinc_kernel,
    sample_stage_kernel,
)
from instarevive_tpu.ops.attention import attention, flash_attention, sdpa  # noqa: F401
from instarevive_tpu.ops.masking import (  # noqa: F401
    get_mask_indices,
    mask_out_tokens,
    unmask_tokens,
)
