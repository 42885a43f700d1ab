"""Probe the host<->device link: H2D/D2H rates, round-trip, duplex overlap.

Measures (on the real attached device):
  * sync round-trip latency (tiny transfer),
  * H2D rate on incompressible (random) and compressible (smooth) payloads,
  * D2H rate,
  * whether an H2D upload and a D2H fetch overlap (full-duplex) or serialize.

Used to (re)calibrate PERFORMANCE.md's link model and bench.py's
attribution numbers. Run: python tools/probe_link.py [MB]
"""

import sys
import threading
import time

import numpy as np


def main() -> None:
    import jax

    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    n = int(mb * 1024 * 1024)
    dev = jax.devices()[0]
    print(f"device: {dev}")

    rng = np.random.default_rng(0)
    rand_u8 = rng.integers(0, 256, n, dtype=np.uint8)
    import scipy.ndimage as ndi

    smooth = ndi.gaussian_filter(
        rng.uniform(0, 255, (1024, n // 1024)), 2.0
    ).astype(np.uint8).ravel()

    # round trip
    one = np.zeros(8, np.uint8)
    for _ in range(2):
        np.asarray(jax.device_put(one))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        np.asarray(jax.device_put(one))
    rt = (time.perf_counter() - t0) / reps
    print(f"sync round-trip: {rt*1e3:.1f} ms")

    def h2d_rate(payload, label):
        jax.device_put(payload[: 1 << 16]).block_until_ready()  # warm
        t0 = time.perf_counter()
        x = jax.device_put(payload)
        x.block_until_ready()
        dt = time.perf_counter() - t0
        print(f"H2D {label}: {len(payload)/1e6/dt:.1f} MB/s ({dt:.2f}s)")
        return x, dt

    xr, t_h2d = h2d_rate(rand_u8, "random  ")
    xs, _ = h2d_rate(smooth, "smooth  ")

    # D2H of random content (incompressible either way)
    xr.copy_to_host_async()
    t0 = time.perf_counter()
    np.asarray(xr)
    dt = time.perf_counter() - t0
    print(f"D2H random : {n/1e6/dt:.1f} MB/s ({dt:.2f}s)")
    # D2H again (cached? should re-transfer)
    t0 = time.perf_counter()
    np.asarray(xs)
    d2h_s = time.perf_counter() - t0
    print(f"D2H smooth : {n/1e6/d2h_s:.1f} MB/s ({d2h_s:.2f}s)")

    # duplex: start D2H of xr while uploading a fresh random buffer
    rand2 = rng.integers(0, 256, n, dtype=np.uint8)
    xr2 = None
    t_all0 = time.perf_counter()

    def up():
        nonlocal xr2
        xr2 = jax.device_put(rand2)
        xr2.block_until_ready()

    th = threading.Thread(target=up)
    xr.copy_to_host_async()
    th.start()
    np.asarray(xr)
    t_d2h_done = time.perf_counter() - t_all0
    th.join()
    t_both = time.perf_counter() - t_all0
    print(
        f"duplex: D2H done at {t_d2h_done:.2f}s, both done at {t_both:.2f}s "
        f"(serial would be ~{2*t_h2d:.2f}s, full-duplex ~{t_h2d:.2f}s)"
    )


if __name__ == "__main__":
    main()
