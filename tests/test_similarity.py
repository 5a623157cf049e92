"""Retrieval op tests: reference-quirk metric vs torch oracle, Pallas
kernel (interpret mode) vs XLA, alternative metrics, top-k."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from nope_tpu.ops import similarity as sim_ops
from nope_tpu.ops.experimental import pallas_similarity


def _torch_reference_similarity(query_nchw, bank_nchw):
    """Oracle: the exact reference scoring (model.py:254-266)."""
    q = torch.from_numpy(query_nchw)[:, None]  # B,1,C,h,w
    t = torch.from_numpy(bank_nchw)  # B,N,C,h,w
    distance = (q - t) ** 2
    distance = torch.norm(distance, dim=2)
    return -(distance.sum(dim=3).sum(dim=2)).numpy()


def _make_data(rng, b=2, n=16, c=4, h=8, w=8):
    query = rng.normal(size=(b, c, h, w)).astype(np.float32)
    bank = rng.normal(size=(b, n, c, h, w)).astype(np.float32)
    # NHWC views for our ops
    query_nhwc = np.transpose(query, (0, 2, 3, 1))
    bank_nhwc = np.transpose(bank, (0, 1, 3, 4, 2))
    return query, bank, query_nhwc, bank_nhwc


def test_reference_similarity_matches_torch_oracle(rng):
    query, bank, q_nhwc, t_nhwc = _make_data(rng)
    expected = _torch_reference_similarity(query, bank)
    ours = np.asarray(
        sim_ops.reference_similarity_xla(jnp.asarray(q_nhwc), jnp.asarray(t_nhwc))
    )
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-4)


def test_pallas_kernel_matches_xla(rng):
    _, _, q_nhwc, t_nhwc = _make_data(rng, b=2, n=16, c=4, h=8, w=8)
    xla = np.asarray(
        sim_ops.reference_similarity_xla(jnp.asarray(q_nhwc), jnp.asarray(t_nhwc))
    )
    pallas = np.asarray(
        pallas_similarity.reference_similarity_pallas(
            jnp.asarray(q_nhwc), jnp.asarray(t_nhwc), interpret=True
        )
    )
    np.testing.assert_allclose(pallas, xla, rtol=1e-5, atol=1e-4)


def test_pallas_kernel_uneven_block(rng):
    # N=12 with block picked automatically (must divide N)
    _, _, q_nhwc, t_nhwc = _make_data(rng, b=1, n=12, c=2, h=4, w=4)
    xla = np.asarray(
        sim_ops.reference_similarity_xla(jnp.asarray(q_nhwc), jnp.asarray(t_nhwc))
    )
    pallas = np.asarray(
        pallas_similarity.reference_similarity_pallas(
            jnp.asarray(q_nhwc), jnp.asarray(t_nhwc), interpret=True
        )
    )
    np.testing.assert_allclose(pallas, xla, rtol=1e-5, atol=1e-4)


def test_l2_similarity_matches_direct(rng):
    _, _, q_nhwc, t_nhwc = _make_data(rng)
    ours = np.asarray(sim_ops.l2_similarity(jnp.asarray(q_nhwc), jnp.asarray(t_nhwc)))
    direct = -np.sum(
        (q_nhwc[:, None] - t_nhwc) ** 2, axis=(2, 3, 4)
    )
    np.testing.assert_allclose(ours, direct, rtol=1e-3, atol=1e-2)


def test_cosine_similarity_bounds(rng):
    _, _, q_nhwc, t_nhwc = _make_data(rng)
    cos = np.asarray(sim_ops.cosine_similarity(jnp.asarray(q_nhwc), jnp.asarray(t_nhwc)))
    assert np.all(cos <= 1.0 + 1e-5) and np.all(cos >= -1.0 - 1e-5)
    # self-similarity is 1
    self_cos = np.asarray(
        sim_ops.cosine_similarity(
            jnp.asarray(q_nhwc), jnp.asarray(q_nhwc[:, None])
        )
    )
    np.testing.assert_allclose(self_cos, 1.0, atol=1e-5)


def test_retrieve_finds_planted_match(rng):
    _, _, q_nhwc, t_nhwc = _make_data(rng, b=2, n=16)
    # plant the query at index 7 of each bank
    t_nhwc = t_nhwc.copy()
    t_nhwc[:, 7] = q_nhwc
    sim, idx = sim_ops.retrieve(jnp.asarray(q_nhwc), jnp.asarray(t_nhwc), k=5)
    assert sim.shape == (2, 16) and idx.shape == (2, 5)
    assert np.all(np.asarray(idx)[:, 0] == 7)
    np.testing.assert_allclose(np.asarray(sim)[:, 7], 0.0, atol=1e-5)
