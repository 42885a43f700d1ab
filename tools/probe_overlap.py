"""Does the axon device overlap compute with transfers? And what do the
bench pipeline's three phases cost in isolation?

Phases measured on the real chip with the REAL bench content/executor:
  1. H2D of one 128-frame chunk (blocking) — effective frame upload rate;
  2. solve+pack with inputs resident — pure device time per chunk;
  3. D2H of the packed prefix — effective download rate;
  4. compute||D2H: a solve dispatched, then an unrelated resident buffer
     fetched while it runs — does the fetch finish before the solve?
  5. the pipelined dispatch-all-then-collect-all pattern vs the sum of
     serial phases — how much overlap the runtime actually gives.

Run: python tools/probe_overlap.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from denseflow_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import cv2
    import jax

    import bench
    from denseflow_tpu.executor import DeviceExecutor

    os.makedirs(bench.BENCH_DIR, exist_ok=True)
    video = os.path.join(bench.BENCH_DIR, "bench.avi")
    if not os.path.exists(video):
        bench._make_video(video)
    cap = cv2.VideoCapture(video)
    frames = []
    while len(frames) < 500:
        ok, fr = cap.read()
        if not ok:
            break
        g = cv2.cvtColor(fr, cv2.COLOR_BGR2GRAY)
        frames.append(cv2.resize(g, (341, 256), interpolation=cv2.INTER_AREA))
    cap.release()
    frames = np.stack(frames)
    chunks = [frames[i : i + 129] for i in (0, 128, 256, 384)]
    ex = DeviceExecutor("tvl1", 256, 341, 1, 20, "jpg", 16, 128, None, 1)

    # warm compile
    list(ex.iter_chunk(chunks[0].copy(), len(chunks[0])))

    # 1: H2D blocking
    t0 = time.perf_counter()
    dev0 = ex.upload_chunk(chunks[0].copy())
    dev0.block_until_ready()
    t_h2d = time.perf_counter() - t0
    print(f"H2D 1 chunk ({chunks[0].nbytes/1e6:.1f} MB raw): {t_h2d:.2f}s "
          f"= {chunks[0].nbytes/1e6/t_h2d:.1f} MB/s effective")

    # 2: solve+pack, inputs resident
    t0 = time.perf_counter()
    outs = ex.dispatch_chunk(dev0, len(chunks[0]))
    (buf, used, pref, pred), _q = outs[0][0]
    used.block_until_ready()
    t_solve = time.perf_counter() - t0
    print(f"solve+pack resident: {t_solve:.2f}s")

    # 3: D2H prefix alone
    t0 = time.perf_counter()
    arr = np.asarray(pref)
    t_d2h = time.perf_counter() - t0
    print(f"D2H prefix ({arr.nbytes/1e6:.1f} MB): {t_d2h:.2f}s "
          f"= {arr.nbytes/1e6/t_d2h:.1f} MB/s")

    # 4: compute || D2H of an unrelated resident buffer
    big = ex.upload_chunk(chunks[1].copy())
    big.block_until_ready()
    outs2 = ex.dispatch_chunk(dev0, len(chunks[0]))  # ~t_solve of work
    (b2, u2, p2, _), _ = outs2[0][0]
    t0 = time.perf_counter()
    np.asarray(big[:64])  # ~2.8 MB fetch while the solve runs
    t_fetch = time.perf_counter() - t0
    u2.block_until_ready()
    t_total = time.perf_counter() - t0
    print(f"fetch-during-solve: fetch {t_fetch:.2f}s, solve done {t_total:.2f}s "
          f"(overlap {'YES' if t_fetch < t_total * 0.7 else 'NO/WEAK'})")
    np.asarray(p2)

    # 5: dispatch all 4 chunks, then collect all
    t0 = time.perf_counter()
    devs = [ex.upload_chunk(c.copy()) for c in chunks]
    pend = [ex.dispatch_chunk(d, len(c)) for d, c in zip(devs, chunks)]
    t_disp = time.perf_counter() - t0
    for p in pend:
        for _ in ex.collect_chunk(p):
            pass
    t_all = time.perf_counter() - t0
    serial = 4 * (t_h2d + t_solve + t_d2h)
    print(f"pipelined 4 chunks: dispatch {t_disp:.2f}s, total {t_all:.2f}s "
          f"(serial-sum would be {serial:.2f}s)")


if __name__ == "__main__":
    main()
