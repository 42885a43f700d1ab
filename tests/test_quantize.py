"""Quantizer formulas vs scalar re-implementations of the reference
(reference src/common.cpp:4-46)."""

import jax.numpy as jnp
import numpy as np

from denseflow_tpu.quantize import (
    dequantize_flow_png,
    quantize_cast,
    quantize_flow_pair,
    quantize_flow_png,
)


def _cast_scalar(v, L, H):
    """The reference's CAST macro, scalar (reference src/common.cpp:6)."""
    if v > H:
        return 255
    if v < L:
        return 0
    # cvRound = round-half-to-even
    return int(np.round(255.0 * (v - L) / (H - L)))


def test_cast_matches_reference_scalar(rng):
    vals = np.concatenate(
        [
            rng.uniform(-50, 50, 500),
            np.array([-32.0, 32.0, -32.01, 32.01, 0.0, 31.999, -31.999]),
        ]
    ).astype(np.float32)
    ours = np.asarray(quantize_cast(jnp.asarray(vals), -32.0, 32.0))
    ref = np.array([_cast_scalar(float(v), -32.0, 32.0) for v in vals], np.uint8)
    np.testing.assert_array_equal(ours, ref)


def test_quantize_pair_shapes(rng):
    flow = rng.normal(0, 10, (4, 16, 20, 2)).astype(np.float32)
    qx, qy = quantize_flow_pair(jnp.asarray(flow), 20.0)
    assert qx.shape == (4, 16, 20) and qx.dtype == jnp.uint8
    assert qy.shape == (4, 16, 20)
    # midpoint: zero flow -> CAST(0,-b,b) = round(127.5) = 128
    z = jnp.zeros((1, 4, 4, 2))
    qx, qy = quantize_flow_pair(z, 20.0)
    assert int(np.asarray(qx)[0, 0, 0]) == 128


def _png_bound_scalar(comp, axis_len):
    """reference src/common.cpp:24-32."""
    mag = max(abs(comp.min()), abs(comp.max()))
    b = min(255.0 * 4, np.ceil((min(axis_len, mag) * 128.0 / 127.0) / 4) * 4)
    if int(b) % 8 == 0:
        b += 4
    return b


def test_png_bounds_match_reference_scalar(rng):
    h, w = 24, 30
    for scale in (0.5, 3.0, 40.0, 2000.0):
        flow = (rng.normal(0, scale, (h, w, 2))).astype(np.float32)
        img = np.asarray(quantize_flow_png(jnp.asarray(flow)))
        bx = _png_bound_scalar(flow[..., 0], w)
        by = _png_bound_scalar(flow[..., 1], h)
        # channel 2 encodes bound/4: top half bound_x, bottom half bound_y
        assert img[0, 0, 2] == round(bx / 4), scale
        assert img[h - 1, 0, 2] == round(by / 4), scale
        assert img[h // 2, 0, 2] == round(bx / 4)  # row h//2 belongs to top
        assert img[h // 2 + 1, 0, 2] == round(by / 4)
        # channel 0/1: convertTo(x, alpha=128/bound, beta=128) semantics
        ref_x = np.clip(np.round(flow[..., 0] * (128.0 / bx) + 128.0), 0, 255)
        np.testing.assert_array_equal(img[..., 0], ref_x.astype(np.uint8))


def test_png_roundtrip(rng):
    flow = rng.normal(0, 5, (2, 24, 30, 2)).astype(np.float32)
    img = quantize_flow_png(jnp.asarray(flow))
    rec = np.asarray(dequantize_flow_png(img))
    # quantization step is bound/128 ≈ 8/128; allow one step
    assert np.abs(rec - flow).max() < 0.15


def test_png_bound_never_multiple_of_8(rng):
    for scale in (1.0, 7.9, 16.0, 31.8, 100.0):
        flow = (rng.normal(0, scale, (16, 16, 2))).astype(np.float32)
        img = np.asarray(quantize_flow_png(jnp.asarray(flow)))
        assert (int(img[0, 0, 2]) * 4) % 8 != 0
        assert (int(img[15, 0, 2]) * 4) % 8 != 0
