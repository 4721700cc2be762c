"""Seeding, dynamic class loading, image preprocessing helpers.

Reference parity: `src/utils/pipeline.py:11-91`. Image ops are numpy
channel-first float32 here (the TPU path re-normalizes inside jit; these
helpers serve host-side adapters and tests).
"""

from __future__ import annotations

import importlib
import os
import random

import numpy as np

IMAGENET_STANDARD_MEAN = np.array([0.5, 0.5, 0.5], dtype=np.float32)
IMAGENET_STANDARD_STD = np.array([0.5, 0.5, 0.5], dtype=np.float32)


def set_seed_everywhere(seed: int, train: bool = True) -> None:
    """Seed python/numpy (+ tf when the data pipeline is in play).

    JAX is functional — device RNG comes from explicit `jax.random.key(seed)`
    threaded through the trainer/policy, so there is no global JAX seed here.
    """
    np.random.seed(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    if train:
        try:
            import tensorflow as tf

            tf.random.set_seed(seed)
        except ImportError:
            pass


def get_class_from_path(class_path: str):
    """Resolve "pkg.module.ClassName" -> class object (convention-over-
    configuration hook used by the config layer for adapters/evaluators)."""
    module_name, class_name = class_path.rsplit(".", 1)
    module = importlib.import_module(module_name)
    return getattr(module, class_name)


def process_images(
    images: np.ndarray,
    rescale_factor: float = 1 / 255.0,
    image_mean: np.ndarray = IMAGENET_STANDARD_MEAN,
    image_std: np.ndarray = IMAGENET_STANDARD_STD,
) -> np.ndarray:
    """uint8 [B, C, H, W] -> normalized float32 ((x*scale - mean) / std).

    With the default mean/std of 0.5 this maps to [-1, 1], the SigLIP input
    range.
    """
    images = np.asarray(images)
    assert images.ndim == 4, f"Expected 4D array, got {images.ndim}D"
    assert images.shape[1] == 3, f"Expected 3 channels at axis 1, got {images.shape[1]}"
    x = images.astype(np.float32) * rescale_factor
    return (x - image_mean[None, :, None, None]) / image_std[None, :, None, None]


def revert_processed_images(
    processed: np.ndarray,
    image_mean: np.ndarray = IMAGENET_STANDARD_MEAN,
    image_std: np.ndarray = IMAGENET_STANDARD_STD,
    rescale_factor: float = 1 / 255.0,
) -> np.ndarray:
    """Inverse of process_images -> uint8 [B, C, H, W] (for video dumps)."""
    x = processed * image_std[None, :, None, None] + image_mean[None, :, None, None]
    x = x / rescale_factor
    return np.clip(np.rint(x), 0, 255).astype(np.uint8)
