"""Probe: float32 statistics of real TVL1 solver output, to design the
lossless h5 wire codec (round-5 item 1).

Decodes frames of the bench video (the exact BASELINE config-5-style
content), runs the real TVL1 solver on the chip, fetches the raw float
flow, and evaluates candidate lossless transforms host-side:

* exact horizontal-equality fraction (how piecewise-constant the float
  field really is);
* per-value byte-length classes of the zigzag'd int32 horizontal delta
  (arithmetic, in float-bit space) vs the XOR residual;
* group-of-4 max-class coding cost (the v4 candidate: one 2-bit class per
  group, occupied groups emit 4*class bytes).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
import numpy as np


def fetch_flow(n_pairs=128, algorithm="tvl1"):
    import cv2
    import jax
    import bench

    os.makedirs(bench.BENCH_DIR, exist_ok=True)
    vid = os.path.join(bench.BENCH_DIR, "bench.avi")
    if not os.path.exists(vid):
        bench._make_video(vid)
    cap = cv2.VideoCapture(vid)
    frames = []
    for _ in range(n_pairs + 1):
        ok, fr = cap.read()
        if not ok:
            break
        g = cv2.cvtColor(fr, cv2.COLOR_BGR2GRAY)
        g = cv2.resize(g, (341, 256), interpolation=cv2.INTER_AREA)
        frames.append(g)
    cap.release()
    frames = np.stack(frames)
    from denseflow_tpu.executor import get_executor

    ex = get_executor(algorithm, 256, 341, 1, 20, "h5", 32, 512)
    flow = ex.run_chunk(frames, frames.shape[0])
    return np.asarray(flow)  # (m, H, W, 2) float32


def classes(z):
    """byte-length class of each uint32: 0,1,2,4."""
    c = np.zeros(z.shape, np.uint8)
    c[z > 0] = 1
    c[z > 0xFF] = 2
    c[z > 0xFFFF] = 4
    return c


def stats(name, d_i32):
    """d_i32: int32 residuals (m, C, H, n). Reports the group-coded cost."""
    z = ((d_i32.astype(np.int64) << 1) ^ (d_i32.astype(np.int64) >> 31)) & 0xFFFFFFFF
    z = z.astype(np.uint32)
    c = classes(z)
    n_vals = c.size
    frac = [float((c == k).mean()) for k in (0, 1, 2, 4)]
    # group-of-4 (along last axis) max-class cost
    n = c.shape[-1]
    gpad = (-n) % 4
    cp = np.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, gpad)])
    g = cp.reshape(cp.shape[:-1] + (-1, 4)).max(axis=-1)
    occupied = float((g > 0).mean())
    payload_bpv = float(4 * g.sum()) / n_vals  # bytes emitted / value
    # overhead: 2-bit class code per OCCUPIED group (packed 4 codes/byte)
    # + 1 bit/group occupancy bitmap
    ovh_bpv = occupied * 0.25 + 1.0 / 32.0
    print(
        f"{name:28s} cls0/1/2/4 = {frac[0]:.3f}/{frac[1]:.3f}/"
        f"{frac[2]:.3f}/{frac[3]:.3f}  grp_occ {occupied:.3f}  "
        f"payload {payload_bpv:.3f} B/val  total {payload_bpv + ovh_bpv:.3f}"
        f" B/val  ratio {4.0 / (payload_bpv + ovh_bpv):.2f}x",
        flush=True,
    )
    return payload_bpv + ovh_bpv


def main():
    n_pairs = int(os.environ.get("PROBE_PAIRS", "128"))
    flow = fetch_flow(n_pairs)
    m, H, W, _ = flow.shape
    print(f"flow {flow.shape} range [{flow.min():.2f}, {flow.max():.2f}]")
    x = np.moveaxis(flow, -1, 1)  # (m, 2, H, W)
    xi = x.view(np.uint32)
    eq = (x[..., 1:] == x[..., :-1]).mean()
    print(f"exact horizontal float equality: {eq:.4f}")
    eqv = (x[..., 1:, :] == x[..., :-1, :]).mean()
    print(f"exact vertical   float equality: {eqv:.4f}")

    # candidate 1: arithmetic delta in float-bit space, horizontal
    d = (xi[..., 1:].astype(np.int64) - xi[..., :-1].astype(np.int64))
    stats("int-delta horiz", d.astype(np.int32))
    # candidate 2: XOR residual horizontal (zigzag is a no-op conceptually
    # but run through the same cost model: xor already small for shared
    # prefixes; classes computed on the raw xor value)
    xo = (xi[..., 1:] ^ xi[..., :-1]).astype(np.uint32)
    c = classes(xo)
    frac = [float((c == k).mean()) for k in (0, 1, 2, 4)]
    n = c.shape[-1]
    cp = np.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, (-n) % 4)])
    g = cp.reshape(cp.shape[:-1] + (-1, 4)).max(axis=-1)
    occ = float((g > 0).mean())
    pay = float(4 * g.sum()) / c.size
    print(
        f"{'xor horiz':28s} cls0/1/2/4 = {frac[0]:.3f}/{frac[1]:.3f}/"
        f"{frac[2]:.3f}/{frac[3]:.3f}  grp_occ {occ:.3f}  payload "
        f"{pay:.3f} B/val  total {pay + occ * .25 + 1 / 32:.3f} B/val",
        flush=True,
    )
    # candidate 3: vertical arithmetic delta
    dv = (xi[..., 1:, :].astype(np.int64) - xi[..., :-1, :].astype(np.int64))
    stats("int-delta vert", dv.astype(np.int32))
    # candidate 4: horizontal delta of f16-ROUNDED field + exact f32
    # residual would be lossy-first — skipped; disk must be bit-exact.

    # byte-plane entropy of the zigzag horiz delta (theoretical floor for
    # a per-plane order-0 coder)
    z = ((d << 1) ^ (d >> 63)) & 0xFFFFFFFF
    z = z.astype(np.uint32)
    tot = 0.0
    for k in range(4):
        b = ((z >> (8 * k)) & 0xFF).astype(np.uint8)
        hist = np.bincount(b.reshape(-1), minlength=256).astype(np.float64)
        p = hist / hist.sum()
        ent = -(p[p > 0] * np.log2(p[p > 0])).sum() / 8.0
        tot += ent
        print(f"  zigzag byte-plane {k}: order-0 entropy {ent:.3f} B/val")
    print(f"  order-0 entropy total {tot:.3f} B/val  ratio {4/tot:.2f}x")


if __name__ == "__main__":
    main()
