"""Visualization + profiler smoke tests."""

import numpy as np

from gencomm_tpu.visualization import simple_vis


def test_visualize_writes_png(tmp_path):
    corners = np.random.RandomState(0).uniform(-10, 10, (3, 8, 3))
    gt = np.random.RandomState(1).uniform(-10, 10, (2, 8, 3))
    pts = np.random.RandomState(2).uniform(-20, 20, (500, 4))
    out = simple_vis.visualize(
        corners, gt, pts, [-32, -16, -3, 32, 16, 1],
        str(tmp_path / "frame.png"),
    )
    assert (tmp_path / "frame.png").stat().st_size > 1000
    out2 = simple_vis.vis_bev_feature(
        np.random.rand(20, 40, 8), str(tmp_path / "feat.png")
    )
    assert (tmp_path / "feat.png").stat().st_size > 1000


def test_profiler_helpers():
    import jax.numpy as jnp
    from gencomm_tpu.tools.profiler import (
        param_count, flops_estimate, latency,
    )

    params = {"a": {"w": np.zeros((3, 4))}, "b": {"w": np.zeros(5)}}
    assert param_count(params) == 17

    def f(x):
        return (x @ x.T).sum()

    x = jnp.ones((64, 64))
    fl = flops_estimate(f, x)
    assert fl is None or fl > 0
    lat = latency(f, x, iters=3)
    assert lat["latency_ms"] > 0 and lat["throughput_fps"] > 0
