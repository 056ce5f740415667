"""Tests for the metrics/profiling module."""
import jax.numpy as jnp

from mapping_private_tpu.utils import Metrics


class TestMetrics:
    def test_stage_timing(self):
        m = Metrics()
        with m.stage("voxelize"):
            x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        with m.stage("voxelize", sync_result=x):
            y = x @ x
        s = m.stages["voxelize"]
        assert s.count == 2
        assert s.total_s > 0
        assert s.min_s <= s.mean_s <= s.max_s

    def test_counters_and_report(self):
        m = Metrics()
        m.count("scans")
        m.count("scans")
        m.count("points", 1024)
        rep = m.report()
        assert "scans" in rep and "points" in rep
        assert m.counters["scans"] == 2

    def test_verbosity_gating(self, capsys):
        m = Metrics(verbosity=0)
        m.log(1, "hidden")
        assert capsys.readouterr().out == ""
        m.verbosity = 1
        m.log(1, "shown")
        assert "shown" in capsys.readouterr().out

    def test_time_fn(self):
        m = Metrics()
        out = m.time_fn("matmul", lambda: jnp.ones((8, 8)) @ jnp.ones((8, 8)))
        assert out.shape == (8, 8)
        assert m.stages["matmul"].count == 1
