"""Job configuration + validation.

Mirrors the reference's flag surface (reference tools/denseflow.cpp:8-21) and
its parameter validation matrix (reference src/denseflow_gpu.cpp:9-42), as a
dataclass instead of an OpenCV CommandLineParser.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

ALGORITHMS = ("nv", "tvl1", "farn", "brox")
SAVE_TYPES = ("jpg", "png", "h5")


@dataclasses.dataclass
class FlowConfig:
    """Everything needed to run one extraction job.

    Defaults are byte-compatible with the reference CLI defaults
    (reference tools/denseflow.cpp:8-21): algorithm=tvl1 (the CLI default
    value of `-a`), step=0, bound=32, saveType=jpg, outputDir=".",
    new sizes all 0.
    """

    input: str = ""
    output_dir: str = "."
    algorithm: str = "tvl1"
    step: int = 0
    bound: int = 32
    new_width: int = 0
    new_height: int = 0
    new_short: int = 0
    has_class: bool = False
    use_frames: bool = False
    save_type: str = "jpg"
    force: bool = False
    verbose: bool = False

    # --- extensions over the reference (all optional, defaults match it) ---
    # Frame pairs solved per device invocation. The reference solves pairs
    # one at a time (reference src/denseflow_gpu.cpp:313-341); batching them
    # is the main TPU win. Device-only flows/s on v5e at 256p rises with
    # batch (16 -> 767, 32 -> 892, 64 -> 961, 128 -> 992; BASELINE.md
    # Scaling) — the default stays 16 because pair-count buckets are
    # pair_batch-granular and short videos would pay up to a bucket of
    # padded compute; raise it for long-video workloads on fast links.
    pair_batch: int = 16
    # Max frames decoded per chunk. The reference uses 512
    # (reference include/dense_flow.h:95); we default much smaller so the
    # decode / compute / encode stages actually overlap on short videos —
    # a 200-frame video in one 512-frame chunk serializes the pipeline.
    # Measured on v5e at 256p (500-frame video): 512 -> 158 flows/s,
    # 96 -> 175, 128 -> 191 flows/s.
    chunk_frames: int = 128
    # Decode worker threads for multi-video jobs (stage 1). The reference
    # decodes on one thread (reference src/denseflow_gpu.cpp:219); on TPU
    # hosts with fast device links the single cv2/FFmpeg decode loop is
    # the pipeline bound, so videos are decoded concurrently (each video
    # stays on one worker — chunk order within a video is load-bearing).
    # 0 = auto (min(4, cpu/4)), 1 = the reference's serial behavior.
    decode_workers: int = 0
    # Continue past a broken video instead of aborting the whole list job
    # (the reference aborts: single try/catch in main,
    # reference tools/denseflow.cpp:93-96). `strict=True` restores that.
    strict: bool = False
    # Solver-hyperparameter preset: default (reference-exact) / fast /
    # quality — see algorithms.solver_params.
    preset: Optional[str] = None
    # Local chips to data-parallelize pair batches over (0 = all of
    # jax.local_devices()). The reference is hardcoded single-GPU
    # (setDevice(0), reference src/denseflow_gpu.cpp:482).
    devices: int = 0
    # Lossless wire codec for device->host payloads (wire.py): quantized
    # jpg/png payloads cross the device link as a sparse-group delta
    # stream (~0.6-1 bit/px measured; only the used prefix transfers),
    # raw uint8 otherwise. Matters when the chip is remote (tunnel /
    # split deployments) where the link, not the solver, bounds
    # throughput. Output bytes are identical either way.
    wire_pack: bool = True
    # Capture a jax.profiler trace of the run into this directory
    # (view with TensorBoard / xprof). The reference's only profiling aid
    # is the -v queue-event log (reference src/denseflow_gpu.cpp:192-199);
    # this is the TPU-native equivalent with full XLA/host timelines.
    profile_dir: Optional[str] = None
    # Device batch count per algorithm invocation is padded to this multiple
    # to bound XLA recompilation across ragged tail chunks.
    # Host-side sharding (multi-process): assign videos round-robin by index.
    host_id: int = 0
    num_hosts: int = 1
    # Pod-slice mode: initialize jax.distributed, derive host_id/num_hosts
    # from the slice, shard the videolist automatically, and have host 0
    # print a pod-global summary (one counter all-reduce). Replaces the
    # reference's manual split-videolist-per-GPU workflow
    # (reference tools/denseflow.cpp:51-91, README.md:11).
    distributed: bool = False
    # jax.distributed coordinator address (HOST:PORT) for --distributed
    # outside TPU auto-detection environments.
    coordinator: str = ""
    # Finest-level displacement clamp (px) of the solvers' masked-shift
    # warp; 0 = per-algorithm default (40). The reference's CUDA warp is an
    # unclamped texture fetch (reference src/denseflow_gpu.cpp:327), so for
    # very fast motion at high resolution raise this (warp-sweep cost grows
    # proportionally). The png save path advertises bounds up to 1020
    # (reference src/common.cpp:24).
    max_disp: int = 0
    # Wire precision for the h5 save path. The h5 DISK format is float32
    # datasets either way (reference src/common.cpp:120-150); "f16" halves
    # the device-link bytes by downcasting the flow ON DEVICE before
    # transfer (payloads are raw floats — the entropy codec only covers
    # quantized uint8 payloads — and raw float32 is the worst-cased config
    # on a remote link: ~8x the jpg payload, round-3 verdict item 5).
    # f16 is lossy (~1e-3 relative; flow magnitude <= bound clips far
    # coarser on disk anyway) and therefore OPT-IN; "f32" is exact.
    h5_dtype: str = "f32"
    # Pad frame WIDTH up to a multiple of this before the device solve and
    # crop the payload back host-side (0 = off, exact geometry). Every
    # distinct (H, W) costs an XLA compile (20-300 s through a
    # remote-compile tunnel); a mixed-resolution videolist at -ns=256
    # yields one height but many widths, so bucketing to e.g. 64 caps the
    # distinct programs at a handful (round-3 verdict item 5; the
    # reference runs any W x H with zero setup cost,
    # src/denseflow_gpu.cpp:44-80). Frames pad by edge replication; flow
    # near the right edge can differ slightly from the exact-W solve
    # (border handling sees a flat extension), so this is OPT-IN.
    width_bucket: int = 0

    def validate(self) -> None:
        """Raise ValueError on any violation of the reference's rules
        (reference src/denseflow_gpu.cpp:9-42)."""
        if self.algorithm not in ALGORITHMS:
            raise ValueError(f"{self.algorithm} not supported!")
        if self.bound <= 0:
            raise ValueError("bound should > 0!")
        if self.new_height < 0 or self.new_width < 0 or self.new_short < 0:
            raise ValueError("height and width cannot < 0!")
        if self.new_short > 0 and self.new_height + self.new_width != 0:
            raise ValueError("do not set height and width when set short!")
        if self.save_type not in SAVE_TYPES:
            raise ValueError(
                f"only jpg/png/h5 are supported (no {self.save_type}) for output"
            )
        if self.pair_batch <= 0:
            raise ValueError("pair_batch should > 0!")
        if self.devices < 0:
            raise ValueError("devices cannot < 0!")
        if self.max_disp < 0:
            raise ValueError("maxDisp cannot < 0!")
        if self.h5_dtype not in ("f32", "f16"):
            raise ValueError("h5Dtype must be f32 or f16!")
        if self.width_bucket < 0:
            raise ValueError("widthBucket cannot < 0!")
        if self.preset:
            from denseflow_tpu.algorithms import solver_params

            solver_params(self.algorithm, self.preset)  # raises on unknown
        if self.chunk_frames <= abs(self.step):
            raise ValueError("chunk_frames must exceed |step|")
        if not (0 <= self.host_id < self.num_hosts):
            raise ValueError("host_id must be in [0, num_hosts)")

    def validate_paths(self, video_paths, output_dirs) -> None:
        """Path checks, mirroring reference src/denseflow_gpu.cpp:10-19."""
        for vp, od in zip(video_paths, output_dirs):
            if not os.path.exists(vp):
                raise ValueError(f"{vp} does not exist!")
            if not os.path.isdir(od):
                raise ValueError(f"{od} is not a valid dir!")
