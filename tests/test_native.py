"""Tests for the native C++ runtime library (and its numpy fallbacks)."""
import time

import numpy as np
import pytest

from mapping_private_tpu.native import (
    grid_keys,
    native_available,
    parse_floats,
    unpack_rgb,
)
from mapping_private_tpu.io.pcd import load_pcd_arrays


class TestNative:
    def test_builds(self):
        # the environment ships g++ — the native path must actually build
        assert native_available()

    def test_parse_floats_exact(self):
        rng = np.random.default_rng(0)
        vals = rng.normal(0, 100, 10000).astype(np.float32)
        text = " ".join(f"{v:.6g}" for v in vals).encode()
        got = parse_floats(text)
        want = np.array(text.split(), dtype=np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_parse_floats_messy_whitespace(self):
        text = b"  1.5\n\n2.5\t3.5 \r\n 4e-2  "
        np.testing.assert_allclose(
            parse_floats(text), [1.5, 2.5, 3.5, 0.04], rtol=1e-6
        )

    def test_parse_floats_multithreaded_matches(self):
        rng = np.random.default_rng(1)
        vals = rng.normal(size=600000).astype(np.float32)  # > 1MB text
        text = ("\n".join(f"{v:.7g}" for v in vals)).encode()
        assert len(text) > (1 << 20)
        got = parse_floats(text, threads=8)
        assert len(got) == len(vals)
        np.testing.assert_allclose(got, vals, rtol=1e-5)

    def test_grid_keys_match_jax_cell_key(self):
        import jax.numpy as jnp
        from mapping_private_tpu.ops.neighbors import _cell_key

        rng = np.random.default_rng(2)
        xyz = rng.uniform(-5, 5, (1000, 3)).astype(np.float32)
        cell = 0.05
        got = grid_keys(xyz, cell)
        want = np.asarray(
            _cell_key(jnp.floor(jnp.asarray(xyz) / cell).astype(jnp.int32))
        )
        assert (got == want).all()

    def test_unpack_rgb(self):
        packed = np.array([0xFF0000, 0x00FF00, 0x0000FF, 0x804020], np.uint32)
        rgbf = packed.view(np.float32)
        r, g, b = unpack_rgb(rgbf)
        assert r.tolist() == [255, 0, 0, 128]
        assert g.tolist() == [0, 255, 0, 64]
        assert b.tolist() == [0, 0, 255, 32]

    def test_pcd_load_uses_native_and_matches(self):
        # golden-corpus file loads identically through the native path
        d = load_pcd_arrays(
            "/root/reference/cloud_algos/data/cylinder_small.pcd"
        )
        assert d["x"].shape == (384,)
        assert np.isfinite(d["x"]).all()
