from instarevive_tpu.nn.layers import (  # noqa: F401
    Mlp,
    DropPath,
    pixel_shuffle,
    pixel_unshuffle,
    timestep_embedding,
)
