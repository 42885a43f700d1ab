"""Native (C++) emission tier: parity with the cv2 path."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from denseflow_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native emitter not built"
)


def test_jpg_batch_decodable(tmp_path, rng):
    planes = rng.integers(0, 256, (6, 48, 64), dtype=np.uint8)
    paths = [str(tmp_path / f"f_{i:05d}.jpg") for i in range(6)]
    native.write_jpg_batch(planes, paths)
    for i, p in enumerate(paths):
        img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        assert img.shape == (48, 64)
        # same content through lossy jpg (quality 95): tight on smooth data
        assert np.abs(img.astype(int) - planes[i].astype(int)).mean() < 4


def test_jpg_matches_cv2_quality(tmp_path):
    # smooth gradient compresses almost losslessly at q95 in both encoders
    ys, xs = np.mgrid[0:64, 0:80]
    img = ((ys * 2 + xs) % 256).astype(np.uint8)
    p_native = str(tmp_path / "n.jpg")
    native.write_jpg_batch(img[None], [p_native])
    ok, buf = cv2.imencode(".jpg", img)
    a = cv2.imread(p_native, cv2.IMREAD_GRAYSCALE).astype(int)
    b = cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE).astype(int)
    assert np.abs(a - b).mean() < 2


def test_png_batch_lossless(tmp_path, rng):
    frames = rng.integers(0, 256, (4, 32, 40, 3), dtype=np.uint8)
    paths = [str(tmp_path / f"p_{i}.png") for i in range(4)]
    native.write_png_batch(frames, paths)
    for i, p in enumerate(paths):
        back = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        np.testing.assert_array_equal(back, frames[i])


def test_color_jpg_batch(tmp_path, rng):
    frames = np.full((3, 32, 40, 3), 0, np.uint8)
    frames[:, :, :, 0] = 200  # blue-ish BGR
    paths = [str(tmp_path / f"c_{i}.jpg") for i in range(3)]
    native.write_jpg_color_batch(frames, paths)
    back = cv2.imread(paths[0])
    assert back[:, :, 0].mean() > 150  # blue channel dominant
    assert back[:, :, 2].mean() < 80


def test_wire_v4_native_matches_numpy(rng):
    """The C++ v4 float decoder must agree bit-for-bit with the NumPy
    reference on noisy, smooth, special-value and edge-geometry payloads
    (round 5: the NumPy pass cost 0.6-1.0 s per 128-pair chunk)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from denseflow_tpu import native
    from denseflow_tpu.wire import pack_chunk_v4, unpack_chunk_v4

    if not (native.available() and native.has_wire_v4()):
        import pytest

        pytest.skip("native tier not built")
    cases = []
    f = rng.normal(0, 3, (5, 20, 31, 2)).astype(np.float32)
    f[0, 0, 0, 0] = np.inf
    f[0, 0, 1, 0] = np.nan
    f[0, 1, 0, 1] = -0.0
    f[1, 0, 0, 0] = 1e-42
    cases.append(f)
    cases.append(np.full((3, 9, 12, 2), -1.25, np.float32))  # sparse
    cases.append(rng.normal(0, 2, (2, 8, 1, 2)).astype(np.float32))
    cases.append(rng.normal(0, 2, (1, 5, 4, 2)).astype(np.float32))
    for f in cases:
        m, h, w, _ = f.shape
        buf, used = jax.jit(pack_chunk_v4)(jnp.asarray(f))
        buf, used = np.asarray(buf), int(used)
        a = unpack_chunk_v4(buf[:used], m, h, w)
        b = native.wire_unpack_v4(buf[:used], m, h, w)
        assert np.array_equal(a.view(np.uint32), b.view(np.uint32))
        assert np.array_equal(f.view(np.uint32), b.view(np.uint32))
