"""Multi-host layer: jax.distributed init + the run's one collective."""

from denseflow_tpu.parallel.distributed import allreduce_counters, init_distributed

__all__ = ["allreduce_counters", "init_distributed"]
