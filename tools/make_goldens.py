"""Generate checked-in golden flow fields for the fidelity gate.

For each case: synthesize a frame pair with analytically-known ground-truth
flow (warp map with a closed-form inverse), run the INDEPENDENT NumPy TV-L1
oracle (tests/oracle/tvl1_numpy.py — IPOL-style, scipy interpolation) at the
reference hyperparameters, and store everything in tests/golden/<name>.npz:

    I0, I1      uint8 (H, W)      the frame pair
    gt          float32 (H, W, 2) analytic ground-truth flow
    oracle      float32 (H, W, 2) NumPy-oracle TV-L1 flow
    oracle_epe  float              mean EPE of the oracle vs gt (recorded
                                   so the gate's slack is interpretable)

tests/test_fidelity.py asserts the JAX solvers stay within the BASELINE.json
gate (mean EPE <= 0.5 px) of BOTH the oracle fields and the ground truth.

Usage: python tools/make_goldens.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
from scipy import ndimage

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

from oracle.tvl1_numpy import tvl1_numpy  # noqa: E402

GOLDEN = ROOT / "tests" / "golden"
H, W = 96, 128


def _texture(seed: int, h: int = H, w: int = W, margin: int = 16) -> np.ndarray:
    """Smooth textured background with headroom for warping."""
    rng = np.random.default_rng(seed)
    big = ndimage.gaussian_filter(
        rng.uniform(0, 255, (h + 2 * margin, w + 2 * margin)), 1.8
    )
    # stretch to full dynamic range so gradients are strong everywhere
    big = (big - big.min()) / (big.max() - big.min()) * 235 + 10
    return big.astype(np.float64), margin


def _synth(seed: int, gt_fn) -> tuple:
    """I1(x) = I0(W(x)) with W(x) = x - ... chosen so that the BACKWARD
    flow u (I1 sampled at x+u matches I0 at x) is exactly gt_fn."""
    big, m = _texture(seed)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    u, v = gt_fn(xs, ys)
    # I0 = crop of big at offset m; I1(x) = I0(Winv(x)) where Winv is the
    # inverse of x -> x + flow: sample big at the pre-image grid
    I0 = big[m : m + H, m : m + W]
    # Solve x0 + flow(x0) = x for x0 by fixed point (flow is smooth/small)
    x0, y0 = xs.copy(), ys.copy()
    for _ in range(30):
        uu, vv = gt_fn(x0, y0)
        x0 = xs - uu
        y0 = ys - vv
    I1 = ndimage.map_coordinates(big, [y0 + m, x0 + m], order=3, mode="nearest")
    gt = np.stack([u, v], axis=-1).astype(np.float32)
    return (
        np.clip(I0, 0, 255).astype(np.uint8),
        np.clip(I1, 0, 255).astype(np.uint8),
        gt,
    )


def cases():
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0

    def translation(xs, ys):
        return np.full_like(xs, 1.7), np.full_like(ys, -0.8)

    def rotation(xs, ys):
        # exact inverse-map flow for rotation by phi about the center:
        # u(x) = R_phi (x - c) - (x - c)
        phi = np.deg2rad(1.5)
        dx, dy = xs - cx, ys - cy
        return (
            np.cos(phi) * dx - np.sin(phi) * dy - dx,
            np.sin(phi) * dx + np.cos(phi) * dy - dy,
        )

    def zoom(xs, ys):
        s = 1.04
        return (s - 1.0) * (xs - cx), (s - 1.0) * (ys - cy)

    def diag(xs, ys):
        return np.full_like(xs, 2.0), np.full_like(ys, 1.0)

    return {
        "translation": (0, translation),
        "rotation": (1, rotation),
        "zoom": (2, zoom),
        "diag": (3, diag),
    }


def make_real_cases() -> None:
    """Real-content golden cases (round-5 verdict item 8): DECODED frame
    pairs of the bench video (MJPG compression artifacts, resize chain —
    everything the synthetic warps cannot expose), with the independent
    NumPy oracle as reference flow.

    The bench pan moves the crop window +2 px/frame at 360p, so after the
    256-short-side INTER_AREA resize the analytic interior flow is
    (-2 * 341/480, 0) — stored as `gt` (occlusion bands at the left/right
    borders excluded by the gate's margin, tools/device_goldens.py)."""
    import cv2

    sys.path.insert(0, str(ROOT))
    import bench

    vid = Path(bench.BENCH_DIR) / "bench.avi"
    vid.parent.mkdir(exist_ok=True)
    if not vid.exists():
        bench._make_video(str(vid))
    cap = cv2.VideoCapture(str(vid))
    frames = []
    for _ in range(420):
        ok, fr = cap.read()
        if not ok:
            break
        g = cv2.cvtColor(fr, cv2.COLOR_BGR2GRAY)
        frames.append(cv2.resize(g, (341, 256), interpolation=cv2.INTER_AREA))
    cap.release()
    gt_x = -2.0 * 341.0 / 480.0
    for i, t in enumerate((0, 120, 250, 400)):
        I0, I1 = frames[t], frames[t + 1]
        oracle = tvl1_numpy(I0.astype(np.float64), I1.astype(np.float64))
        gt = np.full(oracle.shape, 0, np.float32)
        gt[..., 0] = gt_x
        m = 8  # interior margin: dodge the pan's occlusion bands
        epe = float(
            np.linalg.norm(
                oracle[m:-m, m:-m] - gt[m:-m, m:-m], axis=-1
            ).mean()
        )
        np.savez_compressed(
            GOLDEN / f"real_{i}.npz",
            I0=I0, I1=I1, gt=gt, oracle=oracle.astype(np.float32),
            oracle_epe=np.float32(epe),
        )
        print(f"real_{i} (frame {t}): oracle interior EPE vs analytic "
              f"gt = {epe:.4f} px", flush=True)


def main() -> None:
    GOLDEN.mkdir(exist_ok=True)
    for name, (seed, fn) in cases().items():
        I0, I1, gt = _synth(seed, fn)
        oracle = tvl1_numpy(I0.astype(np.float64), I1.astype(np.float64))
        epe = float(np.linalg.norm(oracle - gt, axis=-1).mean())
        np.savez_compressed(
            GOLDEN / f"tvl1_{name}.npz",
            I0=I0, I1=I1, gt=gt, oracle=oracle.astype(np.float32),
            oracle_epe=np.float32(epe),
        )
        print(f"{name}: oracle mean EPE vs gt = {epe:.4f} px")
    make_real_cases()


if __name__ == "__main__":
    main()
