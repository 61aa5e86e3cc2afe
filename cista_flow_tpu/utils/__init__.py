from .image import (
    CropParameters,
    forward_interpolate,
    normalize_image,
    optimal_crop_size,
)
