"""Test config: force CPU backend with 8 virtual devices so sharding tests
run without TPU hardware, as SURVEY.md §4 prescribes."""

import os

# Must run before any jax backend is initialized. The environment's
# sitecustomize pins jax_platforms to the TPU plugin, so override via
# jax.config (env vars alone are ignored).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_moving_square(
    h=64, w=80, n_frames=6, dx=1.5, dy=-1.0, square=16, noise=0.0, rng=None
):
    """Synthetic sequence: a bright soft-edged square translating at a known
    velocity over a textured background — the golden input for EPE tests."""
    rng = rng or np.random.default_rng(42)
    base = rng.uniform(40, 80, size=(h, w)).astype(np.float32)
    import scipy.ndimage as ndi

    base = ndi.gaussian_filter(base, 3.0)
    frames = []
    for t in range(n_frames):
        img = base.copy()
        x0 = 10 + dx * t
        y0 = 20 + dy * t + (h - 40)
        ys = np.arange(h).reshape(-1, 1)
        xs = np.arange(w).reshape(1, -1)
        mask = (
            np.clip(1 - np.abs((xs - x0 - square / 2) / (square / 2)), 0, 1)
            * np.clip(1 - np.abs((ys - (y0 - (h - 40)) - square / 2) / (square / 2)), 0, 1)
        )
        img = img + 150 * mask
        if noise:
            img = img + rng.normal(0, noise, img.shape)
        frames.append(np.clip(img, 0, 255).astype(np.uint8))
    return np.stack(frames)


@pytest.fixture
def moving_square():
    return make_moving_square
