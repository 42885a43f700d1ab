"""Parameter validation matrix (reference src/denseflow_gpu.cpp:9-42)."""

import pytest

from denseflow_tpu.config import FlowConfig


def _cfg(**kw):
    return FlowConfig(input="x", **kw)


def test_defaults_match_reference_cli():
    cfg = FlowConfig()
    assert cfg.algorithm == "tvl1"
    assert cfg.step == 0
    assert cfg.bound == 32
    assert cfg.save_type == "jpg"
    assert cfg.output_dir == "."
    assert cfg.new_width == cfg.new_height == cfg.new_short == 0


@pytest.mark.parametrize("algo", ["nv", "tvl1", "farn", "brox"])
def test_valid_algorithms(algo):
    _cfg(algorithm=algo, step=1).validate()


def test_bad_algorithm():
    with pytest.raises(ValueError, match="not supported"):
        _cfg(algorithm="dis").validate()


def test_bound_positive():
    with pytest.raises(ValueError, match="bound"):
        _cfg(bound=0).validate()
    with pytest.raises(ValueError, match="bound"):
        _cfg(bound=-3).validate()


def test_negative_sizes():
    with pytest.raises(ValueError, match="cannot"):
        _cfg(new_width=-1).validate()


def test_short_exclusive_with_wh():
    with pytest.raises(ValueError, match="do not set"):
        _cfg(new_short=256, new_width=100).validate()
    with pytest.raises(ValueError, match="do not set"):
        _cfg(new_short=256, new_height=100).validate()
    _cfg(new_short=256).validate()


def test_save_types():
    for st in ("jpg", "png", "h5"):
        _cfg(save_type=st).validate()
    with pytest.raises(ValueError, match="only jpg/png/h5"):
        _cfg(save_type="npy").validate()


def test_chunk_must_exceed_step():
    with pytest.raises(ValueError, match="chunk_frames"):
        _cfg(step=5, chunk_frames=5).validate()
