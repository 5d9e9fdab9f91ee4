"""Streaming frame pipeline: correctness vs direct reads, TUM integration,
error propagation."""

import numpy as np
import pytest

from voxelhashing_demo_tpu.config import tiny_config
from voxelhashing_demo_tpu.utils import io as depth_io
from voxelhashing_demo_tpu.utils import stream, synthetic, tum


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    cfg = tiny_config()
    root = str(tmp_path_factory.mktemp("tum_seq"))
    depths, poses = synthetic.make_sequence(cfg.camera, 6, trans_amp=0.04,
                                            rot_amp_deg=2.0)
    tum.export_sequence(root, [np.asarray(d) for d in depths], poses)
    return root, cfg, [np.asarray(d) for d in depths], poses


def test_stream_matches_direct_reads(tum_dir):
    root, cfg, depths, _ = tum_dir
    pipe, gt = stream.stream_tum(
        root, cfg.camera.width, cfg.camera.height
    )
    assert gt is not None and len(gt) == 6
    got = [np.asarray(d) for d in pipe]
    assert len(got) == 6 == len(pipe)
    for a, b in zip(got, depths):
        np.testing.assert_array_equal(a, b)


def test_stream_frames_are_device_resident(tum_dir):
    import jax

    root, cfg, _, _ = tum_dir
    pipe, _ = stream.stream_tum(root, cfg.camera.width, cfg.camera.height,
                                max_frames=2)
    first = next(iter(pipe))
    assert first.dtype == np.uint16
    assert list(first.devices())[0] == jax.devices()[0]


def test_stream_propagates_decode_errors(tmp_path):
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not a png at all")
    pipe = stream.FramePipeline([str(bad)], 80, 60)
    with pytest.raises(Exception):
        list(pipe)


def test_stream_drives_slam(tum_dir):
    from voxelhashing_demo_tpu.models import hash_slam
    from voxelhashing_demo_tpu.utils import metrics

    root, cfg, _, poses = tum_dir
    pipe, gt = stream.stream_tum(root, cfg.camera.width, cfg.camera.height)
    slam = hash_slam.HashSLAM(cfg)
    for d in pipe:
        slam.process(d)
    ate = metrics.ate_rmse(slam.trajectory, gt, align=False)
    assert ate < 0.02, f"streamed SLAM ATE {ate}"


def test_batch_decode_rejects_wrong_size(tum_dir):
    root, cfg, _, _ = tum_dir
    import glob
    import os

    paths = sorted(glob.glob(os.path.join(root, "depth", "*.png")))[:2]
    with pytest.raises(ValueError):
        depth_io.read_depth_batch(paths, cfg.camera.width * 2,
                                  cfg.camera.height * 2)


def test_stream_close_stops_abandoned_producer(tum_dir):
    """Abandoning a partially consumed pipeline must not leave the
    producer thread blocked on the full queue forever (the leaked
    threads visible in earlier crash dumps); close() stops it."""
    root, cfg, _, _ = tum_dir
    pipe, _ = stream.stream_tum(
        root, cfg.camera.width, cfg.camera.height, prefetch=1
    )
    it = iter(pipe)
    next(it)                      # consume one; producer blocks on put
    pipe.close()
    assert not pipe._thread.is_alive()
