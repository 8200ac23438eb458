"""Grayscale + fixed-threshold binarization.

Reference: ``table_extraction/preprocessing.py:81-94`` (``grayzation``, RGB
channel mean) and ``:97-112`` (``binarization``,
``cv2.threshold(gray, 200, 255, THRESH_BINARY)``).  Same semantics in NumPy.
"""

from __future__ import annotations

import numpy as np

THRESHOLD = 200  # preprocessing.py:109 — fixed, not adaptive


def grayzation(img: np.ndarray) -> np.ndarray:
    """H×W×3 RGB uint8 → H×W uint8 gray (already-gray passes through)."""
    if img.ndim == 2:
        return img
    return img.mean(axis=2).astype(np.uint8)


def binarize(gray: np.ndarray, threshold: int = THRESHOLD) -> np.ndarray:
    """uint8 gray → bool ink mask (True = dark pixel / ink).

    The reference keeps {0,255}; a bool mask is the same information and is
    what every downstream vectorized op consumes.
    """
    return gray <= threshold
