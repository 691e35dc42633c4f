"""Geometric train-time augmentation (host numpy).

Re-implementation of /root/reference/src/utils.py:73-104 (``Transform``):
random flip (none/h/v), rotation from a fixed degree set (nearest-neighbour,
no expansion — torchvision ``rotate`` defaults), optional gaussian noise and
random 64^2 crop. Operates on (T, C, H, W) data + (H, W) mask jointly.
"""
from __future__ import annotations

import numpy as np

ROTATION_DEGREES = (-180, -150, -120, -90, -75, -45, -25, -10, 0, 0, 0, 0,
                    10, 25, 45, 75, 90, 120, 150, 180)


def _rotate_nearest(img: np.ndarray, deg: float) -> np.ndarray:
    """Rotate the trailing two axes by ``deg`` (counter-clockwise, like
    torchvision), nearest neighbour, keep shape, fill 0."""
    if deg % 360 == 0:
        return img
    if deg % 90 == 0:
        return np.rot90(img, k=int(deg // 90), axes=(-2, -1)).copy()
    from scipy import ndimage
    return ndimage.rotate(img, deg, axes=(-1, -2), reshape=False, order=0,
                          mode="constant", cval=0.0)


class Transform:
    def __init__(self, add_noise: bool = False, crop: bool = False,
                 crop_size: int = 64):
        self.add_noise = add_noise
        self.crop = crop
        self.crop_size = crop_size

    def __call__(self, img: np.ndarray, mask: np.ndarray,
                 rng: np.random.Generator):
        deg = int(rng.choice(ROTATION_DEGREES))
        flip = int(rng.choice([0, 1, 2]))

        if self.add_noise and rng.random() > 0.5:
            img = img + 0.01 * rng.standard_normal(img.shape).astype(img.dtype)

        if flip == 1:    # horizontal = flip last axis
            img = img[..., ::-1]
            mask = mask[..., ::-1]
        elif flip == 2:  # vertical = flip rows
            img = img[..., ::-1, :]
            mask = mask[..., ::-1, :]

        img = _rotate_nearest(np.ascontiguousarray(img), deg)
        mask = _rotate_nearest(np.ascontiguousarray(mask), deg)

        if self.crop:
            x0, y0 = rng.integers(0, 64, 2)
            img = img[..., y0:y0 + self.crop_size, x0:x0 + self.crop_size]
            mask = mask[..., y0:y0 + self.crop_size, x0:x0 + self.crop_size]

        return np.ascontiguousarray(img), np.ascontiguousarray(mask)
