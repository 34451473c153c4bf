from .positional import sine_positional_encoding_2d, sinusoidal_table_1d
from .point_sample import point_sample, grid_sample_2d
from .uncertainty import get_uncertain_point_coords_with_randomness
from .resize import bilinear_resize
from .hungarian import hungarian_assign, batched_hungarian
from .deform_attn import ms_deform_attn
from .masks import mask2bbox

__all__ = [
    "sine_positional_encoding_2d",
    "sinusoidal_table_1d",
    "point_sample",
    "grid_sample_2d",
    "get_uncertain_point_coords_with_randomness",
    "bilinear_resize",
    "hungarian_assign",
    "batched_hungarian",
    "ms_deform_attn",
    "mask2bbox",
]
