"""2D image augmentation on numpy HWC float arrays.

Replaces torchvision's ``T.ColorJitter(0.4, 0.4, 0.4)`` used by the reference
datasets: random brightness/contrast/saturation factors drawn uniformly from
``[max(0, 1-v), 1+v]`` and applied in random order (torchvision semantics).
"""

import numpy as np

_GRAY = np.asarray([0.299, 0.587, 0.114], np.float32)


def _blend(img1, img2, factor):
    return factor * img1 + (1.0 - factor) * img2


def adjust_brightness(img, factor):
    return img * factor


def adjust_contrast(img, factor):
    mean = (img @ _GRAY).mean()
    return _blend(img, np.full_like(img, mean), factor)


def adjust_saturation(img, factor):
    gray = (img @ _GRAY)[..., None]
    return _blend(img, np.broadcast_to(gray, img.shape), factor)


def color_jitter(img, strengths, rng):
    """Apply brightness/contrast/saturation jitter in random order.

    Args:
        img: (H, W, 3) float32 in [0, 1].
        strengths: (brightness, contrast, saturation) jitter amplitudes.
        rng: numpy Generator.
    """
    ops = []
    names = (adjust_brightness, adjust_contrast, adjust_saturation)
    for fn, v in zip(names, strengths):
        if v and v > 0:
            lo, hi = max(0.0, 1.0 - v), 1.0 + v
            ops.append((fn, float(rng.uniform(lo, hi))))
    order = rng.permutation(len(ops))
    for k in order:
        fn, f = ops[k]
        img = fn(img, f)
    return np.clip(img, 0.0, 1.0).astype(np.float32)
