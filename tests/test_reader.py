"""Ingest: halo chunking invariants, frame-folder input, job expansion with
.done resume (reference src/denseflow_gpu.cpp:146-280, tools/denseflow.cpp:51-91)."""

import os

import cv2
import numpy as np
import pytest

from conftest import write_video
from denseflow_tpu.config import FlowConfig
from denseflow_tpu.io.reader import (
    EmptyFolderError,
    FrameFolderSource,
    VideoSource,
    expand_jobs,
    open_source,
)


def _gray_frames(n=11, h=32, w=40, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(n)]


@pytest.fixture
def video_11(tmp_path):
    frames = _gray_frames(11)
    path = write_video(tmp_path / "v.avi", frames)
    return path, frames


class TestChunking:
    @pytest.mark.parametrize("step,chunk", [(1, 4), (2, 5), (-1, 4), (-3, 6), (1, 64)])
    def test_pair_count_invariant(self, video_11, step, chunk):
        """sum of per-chunk pairs == total frames - |step| (SURVEY.md §4)."""
        path, frames = video_11
        cfg = FlowConfig(input=path, step=step, chunk_frames=chunk)
        src = VideoSource(path, cfg)
        total_pairs = 0
        total_new_frames = 0
        last_seen = False
        prev_end = 0
        for c in src.chunks(step):
            m = max(len(c.frames) - abs(step), 0)
            assert c.base_start == prev_end
            prev_end += m
            total_pairs += m
            total_new_frames += len(c.frames) - c.halo
            last_seen = c.last
        assert last_seen
        assert total_new_frames == len(frames)
        assert total_pairs == len(frames) - abs(step)

    def test_chunk_boundary_pairs_identical_to_unchunked(self, video_11):
        """The |step| halo makes boundary pairs exact, not approximated."""
        path, _ = video_11
        step = 2
        cfg_small = FlowConfig(input=path, step=step, chunk_frames=4)
        cfg_big = FlowConfig(input=path, step=step, chunk_frames=512)
        chunks_small = list(VideoSource(path, cfg_small).chunks(step))
        chunks_big = list(VideoSource(path, cfg_big).chunks(step))
        assert len(chunks_big) == 1

        def pairs(chunks):
            out = {}
            for c in chunks:
                n = len(c.frames)
                for i in range(n - abs(step)):
                    out[c.base_start + i] = (c.frames[i], c.frames[i + abs(step)])
            return out

        ps, pb = pairs(chunks_small), pairs(chunks_big)
        assert ps.keys() == pb.keys()
        for k in pb:
            np.testing.assert_array_equal(ps[k][0], pb[k][0])
            np.testing.assert_array_equal(ps[k][1], pb[k][1])

    def test_resize_applied(self, video_11):
        path, _ = video_11
        cfg = FlowConfig(input=path, step=1, new_short=16)
        src = VideoSource(path, cfg)
        assert src.size == (20, 16)
        c = next(iter(src.chunks(1)))
        assert c.frames.shape[1:] == (16, 20)


class TestFrameFolder:
    def test_reads_sorted_jpgs(self, tmp_path):
        d = tmp_path / "frames"
        d.mkdir()
        for i in [2, 0, 1]:
            cv2.imwrite(str(d / f"img_{i:05d}.jpg"), np.full((8, 8), i * 30, np.uint8))
        (d / "notes.txt").write_text("ignore me")
        cfg = FlowConfig(input=str(d), use_frames=True)
        src = FrameFolderSource(str(d), cfg)
        frames, is_open = src.read_batch(to_gray=True, max_frames=10)
        assert not is_open and len(frames) == 3
        means = [f.mean() for f in frames]
        assert means == sorted(means)

    def test_empty_folder_raises(self, tmp_path):
        d = tmp_path / "empty"
        d.mkdir()
        cfg = FlowConfig(input=str(d), use_frames=True)
        with pytest.raises(EmptyFolderError):
            open_source(str(d), cfg)


class TestExpandJobs:
    def _mklist(self, tmp_path, names):
        vids = []
        for n in names:
            p = tmp_path / n
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_bytes(b"fake")
            vids.append(str(p))
        lst = tmp_path / "list.txt"
        lst.write_text("\n".join(vids) + "\n")
        return str(lst)

    def test_single_video(self, tmp_path):
        v = tmp_path / "a.avi"
        v.write_bytes(b"x")
        cfg = FlowConfig(input=str(v), output_dir=str(tmp_path / "out"))
        jobs, is_record = expand_jobs(cfg)
        assert not is_record
        assert len(jobs) == 1
        assert jobs[0].output_dir.endswith("/a")
        assert os.path.isdir(jobs[0].output_dir)

    def test_list_mode_creates_dirs(self, tmp_path):
        lst = self._mklist(tmp_path, ["c1/a.avi", "c1/b.avi"])
        out = tmp_path / "out"
        cfg = FlowConfig(input=lst, output_dir=str(out))
        jobs, is_record = expand_jobs(cfg)
        assert is_record
        assert [os.path.basename(j.output_dir) for j in jobs] == ["a", "b"]
        assert os.path.isdir(out / ".done")

    def test_class_folder_layout(self, tmp_path):
        lst = self._mklist(tmp_path, ["Jump/a.avi", "Run/b.avi"])
        out = tmp_path / "out"
        cfg = FlowConfig(input=lst, output_dir=str(out), has_class=True)
        jobs, _ = expand_jobs(cfg)
        assert jobs[0].output_dir == str(out / "Jump" / "a")
        assert os.path.isdir(out / ".done" / "Jump")

    def test_done_resume_skips(self, tmp_path):
        lst = self._mklist(tmp_path, ["a.avi", "b.avi"])
        out = tmp_path / "out"
        (out / ".done").mkdir(parents=True)
        (out / ".done" / "a").touch()
        cfg = FlowConfig(input=lst, output_dir=str(out))
        jobs, _ = expand_jobs(cfg)
        assert [os.path.basename(j.video_path) for j in jobs] == ["b.avi"]

    def test_force_overrides_done(self, tmp_path):
        lst = self._mklist(tmp_path, ["a.avi", "b.avi"])
        out = tmp_path / "out"
        (out / ".done").mkdir(parents=True)
        (out / ".done" / "a").touch()
        cfg = FlowConfig(input=lst, output_dir=str(out), force=True)
        jobs, _ = expand_jobs(cfg)
        assert len(jobs) == 2

    def test_sharding_stable_under_other_shards_done_markers(self, tmp_path):
        # regression: sharding must partition on the ORIGINAL list index.
        # When host 0 finishes first and its .done markers land before
        # host 1 expands (sequential shards, or a restarted host mid-
        # fleet), a post-filter partition re-numbers the survivors and
        # orphans videos (no running host owns them). Host 1 must still
        # see exactly its own videos.
        lst = self._mklist(tmp_path, [f"v{i}.avi" for i in range(4)])
        out = tmp_path / "out"
        (out / ".done").mkdir(parents=True)
        (out / ".done" / "v0").touch()  # host 0's shard completed
        (out / ".done" / "v2").touch()
        cfg = FlowConfig(
            input=lst, output_dir=str(out), host_id=1, num_hosts=2
        )
        jobs, _ = expand_jobs(cfg)
        names = [os.path.basename(j.video_path) for j in jobs]
        assert names == ["v1.avi", "v3.avi"]

    def test_host_sharding_partitions(self, tmp_path):
        lst = self._mklist(tmp_path, [f"v{i}.avi" for i in range(7)])
        out = tmp_path / "out"
        all_names = set()
        for host in range(3):
            cfg = FlowConfig(
                input=lst, output_dir=str(out), host_id=host, num_hosts=3
            )
            jobs, _ = expand_jobs(cfg)
            names = {os.path.basename(j.video_path) for j in jobs}
            assert not (names & all_names), "shards must be disjoint"
            all_names |= names
        assert all_names == {f"v{i}.avi" for i in range(7)}
