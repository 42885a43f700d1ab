"""Discrete derivatives used by the variational solvers.

Matches OpenCV TVL1's discretization:
* centered gradient with half-step one-sided differences at the borders,
* forward gradient (zero at the far border),
* backward divergence (adjoint of the forward gradient).

All ops act on the trailing (H, W) axes and are batch-transparent.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def centered_gradient(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(dx, dy): 0.5*(I[x+1]-I[x-1]) inside, 0.5*(I[1]-I[0]) style at edges."""
    right = jnp.concatenate([img[..., :, 1:], img[..., :, -1:]], axis=-1)
    left = jnp.concatenate([img[..., :, :1], img[..., :, :-1]], axis=-1)
    dx = 0.5 * (right - left)
    down = jnp.concatenate([img[..., 1:, :], img[..., -1:, :]], axis=-2)
    up = jnp.concatenate([img[..., :1, :], img[..., :-1, :]], axis=-2)
    dy = 0.5 * (down - up)
    return dx, dy


def forward_gradient(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(dx, dy): I[x+1]-I[x] with 0 at the last column/row."""
    dx = jnp.concatenate(
        [img[..., :, 1:] - img[..., :, :-1], jnp.zeros_like(img[..., :, :1])],
        axis=-1,
    )
    dy = jnp.concatenate(
        [img[..., 1:, :] - img[..., :-1, :], jnp.zeros_like(img[..., :1, :])],
        axis=-2,
    )
    return dx, dy


def divergence(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Backward divergence: div(p)(i,j) = p1(i,j)-p1(i,j-1) + p2(i,j)-p2(i-1,j),
    with the subtracted term dropped at j=0 / i=0 (adjoint of forward_gradient)."""
    dpx = jnp.concatenate(
        [p1[..., :, :1], p1[..., :, 1:] - p1[..., :, :-1]], axis=-1
    )
    dpy = jnp.concatenate(
        [p2[..., :1, :], p2[..., 1:, :] - p2[..., :-1, :]], axis=-2
    )
    return dpx + dpy
