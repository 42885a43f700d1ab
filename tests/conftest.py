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


def write_video(path, frames_gray):
    """Write gray frames as an MJPG .avi (lossy but high quality)."""
    import cv2

    h, w = frames_gray[0].shape
    vw = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"MJPG"), 25, (w, h)
    )
    assert vw.isOpened()
    for fr in frames_gray:
        vw.write(cv2.cvtColor(fr, cv2.COLOR_GRAY2BGR))
    vw.release()
    return str(path)


def make_translating_video(path, h=64, w=80, n=9, dx=2, dy=0, seed=7):
    """A textured scene whose *content* moves by exactly (-dx, -dy) px/frame
    (the crop window moves by (+dx, +dy)). Returns (path, true_flow)."""
    import scipy.ndimage as ndi

    rng = np.random.default_rng(seed)
    pad = 4 + max(abs(dx), abs(dy)) * n
    base = ndi.gaussian_filter(
        rng.uniform(0, 255, (h + 2 * pad, w + 2 * pad)), 2.0
    ).astype(np.float32)
    frames = []
    for t in range(n):
        fr = base[pad + dy * t : pad + dy * t + h, pad + dx * t : pad + dx * t + w]
        frames.append(np.clip(fr, 0, 255).astype(np.uint8))
    write_video(path, frames)
    return str(path), (-dx, -dy)


@pytest.fixture
def translating_video(tmp_path):
    def _make(**kw):
        return make_translating_video(tmp_path / "vid.avi", **kw)

    return _make
