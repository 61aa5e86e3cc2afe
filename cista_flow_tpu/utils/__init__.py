from .image import (
    InputPadder,
    setup_seed,
    CropParameters,
    forward_interpolate,
    normalize_image,
    optimal_crop_size,
)
