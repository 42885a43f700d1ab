"""denseflow_tpu — a TPU-native dense optical flow engine.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
open-mmlab/denseflow (reference: /root/reference): video/frame ingest,
pyramidal optical flow (TVL1 primal-dual, Farneback polynomial expansion,
Brox variational, plus a fast approximate mode), flow quantization, and
jpg/png/hdf5 emission with idempotent `.done` resume — built TPU-first:

* frame **pairs are batched** into single device invocations (the reference
  solves one pair at a time on one CUDA stream,
  reference src/denseflow_gpu.cpp:313-341);
* solvers are **jit-compiled, static-shape** `lax.scan` loops, with Pallas
  kernels for the hot TVL1 primal-dual iterations;
* scaling is first-class via `jax.sharding.Mesh` over frame-pair batches and
  video shards per host (the reference is hard-coded single-GPU,
  reference src/denseflow_gpu.cpp:482).
"""

__version__ = "0.1.0"

from denseflow_tpu.config import FlowConfig  # noqa: F401
