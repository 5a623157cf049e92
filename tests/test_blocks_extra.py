"""Smoke tests for the extended block library (conditional blocks,
imagen-style attention, timestep embedding) and the EMA helper."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from nope_tpu.models import blocks


def test_conditional_resnet_block(rng):
    m = blocks.ConditionalResnetBlock(dim_out=8, groups=4)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    te = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    ce = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    v = m.init(jax.random.key(0), x, te, ce)
    out = m.apply(v, x, te, ce)
    assert out.shape == (2, 8, 8, 8)
    # FiLM conditioning changes the output
    out2 = m.apply(v, x, te + 1.0, ce)
    assert float(jnp.abs(out - out2).max()) > 1e-5


def test_dual_conditional_resnet_block(rng):
    m = blocks.DualConditionalResnetBlock(dim_out=8, groups=4)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    ref = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    te = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    ce = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    v = m.init(jax.random.key(0), x, ref, te, ce)
    out = m.apply(v, x, ref, te, ce)
    assert out.shape == (2, 8, 8, 8)
    out2 = m.apply(v, x, ref + 1.0, te, ce)
    assert float(jnp.abs(out - out2).max()) > 1e-5  # reference map conditions


def test_timestep_embedding_matches_torch_formula():
    dim = 16
    t = jnp.asarray([0.0, 1.0, 100.0])
    emb = np.asarray(blocks.timestep_embedding(t, dim))
    assert emb.shape == (3, dim)
    # torch reference formula (ldm/util.py:139-159)
    half = dim // 2
    freqs = torch.exp(-np.log(10000) * torch.arange(half) / half)
    args = torch.tensor([0.0, 1.0, 100.0])[:, None] * freqs[None]
    expected = torch.cat([torch.cos(args), torch.sin(args)], dim=-1).numpy()
    np.testing.assert_allclose(emb, expected, atol=1e-5)


def test_channel_layer_norm(rng):
    m = blocks.ChannelLayerNorm()
    x = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32)) * 3 + 1
    v = m.init(jax.random.key(0), x)
    out = np.asarray(m.apply(v, x))
    np.testing.assert_allclose(out.mean(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(-1), 1.0, atol=1e-2)


def test_imagen_cross_attention(rng):
    m = blocks.ImagenCrossAttention(heads=2, dim_head=8)
    x = jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(2, 3, 16)).astype(np.float32))
    v = m.init(jax.random.key(0), x, ctx)
    out = m.apply(v, x, ctx)
    assert out.shape == (2, 6, 16)
    mask = jnp.asarray([[True, True, False], [True, False, False]])
    out_masked = m.apply(v, x, ctx, mask)
    assert float(jnp.abs(out - out_masked).max()) > 1e-6


def test_ema_update():
    from nope_tpu.training.optim import ema_update

    ema = {"w": jnp.ones(3)}
    new = {"w": jnp.zeros(3)}
    out = ema_update(ema, new, beta=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9)
