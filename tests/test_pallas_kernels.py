"""Pallas NN kernels in interpret mode (CPU) — exactness vs brute force."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapping_private_tpu.ops.pallas_nn import (
    nn_argmin_prepared,
    nn_gather_prepared,
    nn_pallas,
    prepare_nn_ref,
    prepare_nn_ref_argmin,
)


def _pair(nq=300, nr=900, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.uniform(-1, 1, (nq, 3)).astype(np.float32)
    r = rng.uniform(-1, 1, (nr, 3)).astype(np.float32)
    d2 = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    return q, r, d2.argmin(1), d2.min(1)


class TestPallasInterpret:
    def test_nn_argmin_exact(self):
        q, r, idx_true, sq_true = _pair()
        rt = prepare_nn_ref_argmin(jnp.asarray(r))
        idx, sq = nn_argmin_prepared(jnp.asarray(q), rt, interpret=True)
        assert (np.asarray(idx) == idx_true).all()
        np.testing.assert_allclose(np.asarray(sq), sq_true, atol=1e-5)

    def test_nn_pallas_exact(self):
        q, r, idx_true, sq_true = _pair(seed=1)
        idx, sq = nn_pallas(jnp.asarray(q), jnp.asarray(r), interpret=True)
        assert (np.asarray(idx) == idx_true).all()
        np.testing.assert_allclose(np.asarray(sq), sq_true, atol=1e-5)

    def test_nn_gather_values(self):
        q, r, idx_true, sq_true = _pair(seed=2)
        aux = np.random.default_rng(3).normal(size=r.shape).astype(np.float32)
        rt, nt = prepare_nn_ref(jnp.asarray(r), jnp.asarray(aux))
        sq, qs, ns = nn_gather_prepared(jnp.asarray(q), rt, nt, interpret=True)
        np.testing.assert_allclose(np.asarray(sq), sq_true, atol=1e-4)
        np.testing.assert_allclose(np.asarray(qs), r[idx_true], atol=1e-5)
        np.testing.assert_allclose(np.asarray(ns), aux[idx_true], atol=1e-5)

    def test_dead_query_padding(self):
        from mapping_private_tpu.core.cloud import PAD_COORD

        q, r, idx_true, _ = _pair(seed=4)
        q2 = np.vstack([q, np.full((5, 3), -PAD_COORD, np.float32)])
        rt = prepare_nn_ref_argmin(jnp.asarray(r))
        idx, sq = nn_argmin_prepared(jnp.asarray(q2), rt, interpret=True)
        assert (np.asarray(idx[: len(q)]) == idx_true).all()
        assert np.isfinite(np.asarray(sq[: len(q)])).all()
