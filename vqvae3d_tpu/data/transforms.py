"""Host-side volume transforms for the CT pipeline.

Numpy equivalents of the reference's MONAI transform chain
(/root/reference/utils/load_nrrd_dataset.py:75-86) and loss-masking helpers:

  * ``hu_window_normalize`` — clamp HU to [−1500, 3000], ÷1000, +1 →
    value range [−0.5, 4].
  * ``depth_pad_and_crop`` — post-pad depth to 128, truncate, return the
    number of valid slices (the loss-mask label;
    load_nrrd_dataset.py:16-44 — note the reference computes a random crop
    center it never uses; we don't replicate that dead code).
  * ``create_cylinder_xy_mask`` / ``extract_center_cylinder`` — boolean CT
    gantry cylinder over (x, y) used as pre-loss filter
    (load_nrrd_dataset.py:258-300, vqvae/model.py:138-139, :210).

Volume layout: (H, W, D) single-channel numpy on the host; the loader adds
the channel axis last → (H, W, D, 1).
"""
from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

HU_MIN, HU_MAX, HU_SCALE = -1500.0, 3000.0, 1000.0


def hu_window_normalize(volume: np.ndarray) -> np.ndarray:
    """HU → normalized [−0.5, 4] float32.

    Single-allocation, in-place passes: the naive clip/div/add chain made
    three full copies of a 134 MB volume — measurable at ~29M voxels on
    a loader worker core (tools/bench_loader.py)."""
    v = np.asarray(volume).astype(np.float32, copy=True)
    np.clip(v, HU_MIN, HU_MAX, out=v)
    v /= HU_SCALE
    v += 1.0
    return v


def hu_unnormalize(volume: np.ndarray) -> np.ndarray:
    """Normalized → integer HU (decode_embeddings.py:45-47)."""
    v = np.asarray(volume, dtype=np.float32) * HU_SCALE - HU_SCALE
    return np.rint(v).astype(np.int32)


def depth_pad_and_crop(
    volume: np.ndarray, output_depth: int = 128, pad_value: float = 0.0
) -> Tuple[np.ndarray, int]:
    """Post-pad/truncate the last axis to ``output_depth``; returns
    (volume, num_valid_slices)."""
    d = volume.shape[-1]
    num_valid = min(d, output_depth)
    if d < output_depth:
        pad = [(0, 0)] * (volume.ndim - 1) + [(0, output_depth - d)]
        volume = np.pad(volume, pad, constant_values=pad_value)
    else:
        volume = volume[..., :output_depth]
    return volume, num_valid


@lru_cache(maxsize=8)
def create_cylinder_xy_mask(size: Tuple[int, int]) -> np.ndarray:
    """Boolean (H, W) mask of the inscribed cylinder (gantry FOV)."""
    x_size, y_size = size
    radius = min(x_size, y_size) / 2
    x_center, y_center = x_size / 2, y_size / 2
    x, y = np.ogrid[:x_size, :y_size]
    dist = np.sqrt((x - x_center) ** 2 + (y - y_center) ** 2)
    return dist <= radius


def extract_center_cylinder(tensor, mask: np.ndarray | None = None):
    """Select cylinder-interior (x, y) positions of a (..., H, W, D, C)
    array → (..., n_inside, D, C). Mask is a static numpy bool array, so
    under jit this lowers to a static gather."""
    h, w = tensor.shape[-4], tensor.shape[-3]
    if mask is None:
        mask = create_cylinder_xy_mask((h, w))
    return tensor[..., mask, :, :]
