"""Static image padding (compile-time shapes).

``ImagePadder`` reproduces the reference's left/top-only zero padding to
multiples of ``min_size`` (ref: utils/image_process.py:60-107). Pad amounts
are computed from a static ``image_dim`` at construction, so everything under
``jit`` keeps static shapes.
"""
from __future__ import annotations

import jax.numpy as jnp


class ImagePadder:
    """Pads NHWC tensors on the LEFT and TOP only (zeros), like the reference."""

    def __init__(self, image_dim, min_size: int = 32):
        self.height, self.width = int(image_dim[0]), int(image_dim[1])
        self.min_size = min_size
        self.pad_height = (min_size - self.height % min_size) % min_size
        self.pad_width = (min_size - self.width % min_size) % min_size

    @property
    def padded_dim(self):
        return (self.height + self.pad_height, self.width + self.pad_width)

    def pad(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.pad_height == 0 and self.pad_width == 0:
            return x
        return jnp.pad(
            x,
            ((0, 0), (self.pad_height, 0), (self.pad_width, 0), (0, 0)),
        )

    def unpad(self, x: jnp.ndarray) -> jnp.ndarray:
        return x[:, self.pad_height:, self.pad_width:, :]
