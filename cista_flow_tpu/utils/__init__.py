from .image import normalize_image, optimal_crop_size
