from denseflow_tpu.parallel.mesh import make_mesh, shard_batch, sharded_solver

__all__ = ["make_mesh", "shard_batch", "sharded_solver"]
