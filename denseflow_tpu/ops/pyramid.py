"""Image pyramids for the coarse-to-fine solvers.

Shapes must be static under jit, so pyramid geometry is computed host-side
from (H, W, scale, nscales) and the per-level images are produced by
successive cv2-compatible bilinear resizes — the same scheme OpenCV's TVL1
uses (scaleStep=0.8 multiplicative per level, INTER_LINEAR) and Farneback's
(pyrScale=0.5).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from denseflow_tpu.ops.resize import resize_bilinear


def pyramid_shapes(
    h: int, w: int, scale: float, nscales: int, min_size: int = 16
) -> List[Tuple[int, int]]:
    """Static (h, w) per level, level 0 = finest. Truncates when a side
    would drop below `min_size` (OpenCV TVL1 stops there too)."""
    shapes = [(h, w)]
    ch, cw = float(h), float(w)
    for _ in range(1, nscales):
        ch *= scale
        cw *= scale
        nh, nw = int(round(ch)), int(round(cw))
        if min(nh, nw) < min_size:
            break
        shapes.append((nh, nw))
    return shapes


def build_pyramid(img: jnp.ndarray, shapes: List[Tuple[int, int]]) -> List[jnp.ndarray]:
    """Float image (..., H, W) -> list of per-level images, finest first.

    Each level is resized from the *previous level* (multiplicative), not
    from the base image — matching OpenCV's pyramid construction.
    """
    levels = [img.astype(jnp.float32)]
    for hw in shapes[1:]:
        # take-based on purpose: the dense-matmul resize (resize_bilinear_mm)
        # was tried here round 5 and REVERTED — XLA tiles the matmul
        # differently per batch shape, so per-device-count accumulation
        # order diverges and the multi-device byte-identity contract broke
        # (test_sharding caught 0.04% of pixels drifting past the epsilon
        # ball). The elementwise 2-tap form is batch-shape-invariant, and
        # the measured win was only ~2% on TVL1.
        levels.append(resize_bilinear(levels[-1], hw))
    return levels
