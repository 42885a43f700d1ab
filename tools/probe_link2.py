"""Second-pass link probe: D2H compressibility, variance, duplex validity.

Round-4 question set (after probe_link.py showed D2H random 2 MB/s vs
smooth 21.6 MB/s): is D2H transport-compressed now? How stable are the
rates? Does a D2H overlap an H2D (full duplex)?

Design notes: all payloads are generated HOST-side (no expensive remote
compiles); fresh never-fetched device arrays for D2H come from one tiny
jitted xor program so the host-side result cache cannot short-circuit the
transfer. Run: python tools/probe_link2.py [MB]
"""

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from denseflow_tpu.utils import enable_compile_cache

    enable_compile_cache()

    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    n = int(mb * 1024 * 1024)
    rng = np.random.default_rng(0)
    rand_host = rng.integers(0, 256, n, dtype=np.uint8)
    import scipy.ndimage as ndi

    smooth_host = ndi.gaussian_filter(
        rng.uniform(0, 255, (1024, n // 1024)), 2.0
    ).astype(np.uint8).ravel()

    fresh = jax.jit(lambda a, k: a ^ k)  # never-fetched variant of a

    def put(payload):
        t0 = time.perf_counter()
        x = jax.device_put(payload)
        x.block_until_ready()
        return x, payload.nbytes / 1e6 / (time.perf_counter() - t0)

    def get(x):
        t0 = time.perf_counter()
        a = np.asarray(x)
        return a.nbytes / 1e6 / (time.perf_counter() - t0)

    # warm the transfer path + the xor program
    xw, _ = put(rand_host[: 1 << 16])
    np.asarray(fresh(xw, np.uint8(1)))

    xr, r = put(rand_host)
    print(f"H2D random: {r:.1f} MB/s")
    xs, r = put(smooth_host)
    print(f"H2D smooth: {r:.1f} MB/s")

    for label, src in (("random", xr), ("smooth", xs)):
        rates = [get(fresh(src, np.uint8(k + 2))) for k in range(3)]
        print(f"D2H {label}: " + " ".join(f"{x:.1f}" for x in rates) + " MB/s")

    # async-prefetch head start
    y = fresh(xr, np.uint8(9))
    y.block_until_ready()
    y.copy_to_host_async()
    time.sleep(0.1)
    print(f"D2H random with 0.1s async head start: {get(y):.1f} MB/s")

    # duplex: never-fetched D2H while a fresh random H2D runs
    y = fresh(xr, np.uint8(10))
    y.block_until_ready()
    up_payload = rng.integers(0, 256, n, dtype=np.uint8)
    t_up = {}

    def up():
        t0 = time.perf_counter()
        z = jax.device_put(up_payload)
        z.block_until_ready()
        t_up["dt"] = time.perf_counter() - t0

    th = threading.Thread(target=up)
    t0 = time.perf_counter()
    th.start()
    d2h_rate = get(y)
    th.join()
    t_both = time.perf_counter() - t0
    print(
        f"duplex: D2H {d2h_rate:.1f} MB/s, H2D {n/1e6/t_up['dt']:.1f} MB/s, "
        f"both done {t_both:.2f}s"
    )
    # solo baselines immediately after
    y = fresh(xr, np.uint8(11))
    y.block_until_ready()
    print(f"solo D2H: {get(y):.1f} MB/s")
    _, r = put(up_payload)
    print(f"solo H2D: {r:.1f} MB/s")


if __name__ == "__main__":
    main()
