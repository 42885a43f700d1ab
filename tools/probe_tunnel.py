"""Measure H2D/D2H bandwidth and dispatch latency of the device link.

The axon tunnel to the TPU chip adds wire latency that per-pair CUDA-style
designs would drown in; this probe sizes the transfer/dispatch budget that
the executor must amortize. Dev tool only.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

print(f"backend: {jax.default_backend()}")

# dispatch round-trip latency: tiny scalar op, forced each call
one = jax.device_put(np.float32(1.0))
f = jax.jit(lambda x: x + 1.0)
np.asarray(f(one))
t0 = time.perf_counter()
n = 20
for _ in range(n):
    np.asarray(f(one))
rtt = (time.perf_counter() - t0) / n
print(f"dispatch+sync round-trip: {rtt*1e3:.2f} ms")

# H2D bandwidth
for mb in (1, 8, 32):
    x = np.random.default_rng(0).integers(0, 255, (mb * 1024 * 1024,), dtype=np.uint8)
    jax.device_put(x[:1024]).block_until_ready()
    t0 = time.perf_counter()
    y = jax.device_put(x)
    y.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"H2D {mb:3d} MB: {dt*1e3:8.1f} ms -> {mb/dt:8.1f} MB/s")

# D2H bandwidth
for mb in (1, 8, 32):
    y = jax.device_put(
        np.random.default_rng(0).integers(0, 255, (mb * 1024 * 1024,), dtype=np.uint8)
    )
    y.block_until_ready()
    np.asarray(y[:1024])
    t0 = time.perf_counter()
    _ = np.asarray(y)
    dt = time.perf_counter() - t0
    print(f"D2H {mb:3d} MB: {dt*1e3:8.1f} ms -> {mb/dt:8.1f} MB/s")

# does D2H overlap compute? dispatch a long compute, then async-copy a
# previously computed buffer; if total < compute + copy, overlap works
h, w = 1024, 1024
a = jax.device_put(np.random.default_rng(0).random((h, w), np.float32))
heavy = jax.jit(lambda x: jnp.linalg.matrix_power(x @ x.T / w, 64))
r1 = heavy(a)
r1.block_until_ready()
big = jax.device_put(
    np.random.default_rng(1).integers(0, 255, (32 * 1024 * 1024,), dtype=np.uint8)
)
big.block_until_ready()

t0 = time.perf_counter()
r = heavy(a)
r.block_until_ready()
t_compute = time.perf_counter() - t0

t0 = time.perf_counter()
_ = np.asarray(big)
t_copy = time.perf_counter() - t0

t0 = time.perf_counter()
r = heavy(a)
big.copy_to_host_async()
_ = np.asarray(big)
r.block_until_ready()
t_both = time.perf_counter() - t0
print(
    f"compute {t_compute*1e3:.1f} ms, copy {t_copy*1e3:.1f} ms, "
    f"interleaved {t_both*1e3:.1f} ms "
    f"({'overlaps' if t_both < 0.8*(t_compute+t_copy) else 'serializes'})"
)

# is the tunnel compression-sensitive? smooth (compressible) vs random bytes
import scipy.ndimage as ndi

smooth = ndi.gaussian_filter(
    np.random.default_rng(2).uniform(0, 255, (32, 1024, 1024)), (0, 8, 8)
).astype(np.uint8)
ys = jax.device_put(smooth)
ys.block_until_ready()
t0 = time.perf_counter()
_ = np.asarray(ys)
dt = time.perf_counter() - t0
print(f"D2H 32 MB smooth: {dt*1e3:8.1f} ms -> {32/dt:8.1f} MB/s")

zeros = np.zeros((32, 1024, 1024), np.uint8)
yz = jax.device_put(zeros)
yz.block_until_ready()
t0 = time.perf_counter()
_ = np.asarray(yz)
dt = time.perf_counter() - t0
print(f"D2H 32 MB zeros:  {dt*1e3:8.1f} ms -> {32/dt:8.1f} MB/s")

xs = jax.device_put(smooth[0])
t0 = time.perf_counter()
ys2 = jax.device_put(smooth)
ys2.block_until_ready()
dt = time.perf_counter() - t0
print(f"H2D 32 MB smooth: {dt*1e3:8.1f} ms -> {32/dt:8.1f} MB/s")
