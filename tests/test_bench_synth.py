"""bench.py's on-device frame synthesis is bit-identical to make_frames.

The headline bench synthesizes its input batch ON DEVICE (avoiding the
tunnel's H2D cost); this guards the claim that the measured program sees
the exact same frames the host-side generator (and every other consumer
of the bench scene) produces.  Rebuilds the measurement-protocol intent of
the reference benchmark (/root/reference/benchmark.py:42-52: a fixed
synthetic contaminated scene detected in-memory).
"""

import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def test_device_synth_matches_host_640x480():
    params = bench.scene_params(6, 480, 640, seed=0)
    dev = np.asarray(bench.synth_frames_device(params, 480, 640))
    host = bench.make_frames(6, 480, 640, seed=0)
    assert dev.shape == host.shape == (6, 480, 640, 3)
    assert np.array_equal(dev, host)


def test_device_synth_matches_host_2mp():
    # the 2MP design-point shape and seed used by bench.py's secondary
    params = bench.scene_params(2, 1080, 1920, seed=2)
    dev = np.asarray(bench.synth_frames_device(params, 1080, 1920))
    host = bench.make_frames(2, 1080, 1920, seed=2)
    assert np.array_equal(dev, host)


def test_scene_params_pads_with_minus_one():
    params = bench.scene_params(32, 480, 640, seed=0)
    counts = (params[..., 2] >= 0).sum(axis=1)
    assert counts.min() >= 1 and counts.max() <= 3
    # padded rows are fully -1
    pad = params[params[..., 2] < 0]
    assert (pad == -1).all()
