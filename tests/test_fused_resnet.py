"""Fused ResnetBlock kernel (ops/experimental/fused_resnet.py): interpret-mode
parity vs the XLA reference, module wiring, and gradient exactness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nope_tpu.ops.experimental.fused_resnet import (
    fused_resnet_block,
    resnet_block_pallas,
    resnet_block_reference,
)


def _params(rng, cin, co, with_res):
    p = {
        "w1": rng.normal(size=(3, 3, cin, co)) * 0.1,
        "b1": rng.normal(size=(co,)) * 0.1,
        "g1": rng.uniform(0.5, 1.5, (co,)),
        "be1": rng.normal(size=(co,)) * 0.1,
        "w2": rng.normal(size=(3, 3, co, co)) * 0.1,
        "b2": rng.normal(size=(co,)) * 0.1,
        "g2": rng.uniform(0.5, 1.5, (co,)),
        "be2": rng.normal(size=(co,)) * 0.1,
    }
    if with_res:
        p["res_w"] = rng.normal(size=(cin, co)) * 0.1
        p["res_b"] = rng.normal(size=(co,)) * 0.1
    return {k: jnp.asarray(v, jnp.float32) for k, v in p.items()}


@pytest.mark.parametrize("with_res,with_emb", [(True, True), (False, False)])
@pytest.mark.parametrize("bp", [1, 2, 4])
def test_kernel_matches_reference_interpret(rng, with_res, with_emb, bp):
    cin = 16 if with_res else 24
    co = 24
    x = jnp.asarray(rng.normal(size=(4, 8, 8, cin)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(4, co)), jnp.float32) if with_emb else None
    p = _params(rng, cin, co, with_res)
    want = resnet_block_reference(x, emb, p)
    got = resnet_block_pallas(x, emb, p, interpret=True, samples_per_program=bp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_dispatcher_uses_reference_off_tpu(rng):
    """On the CPU test backend the public entry must route to XLA and
    still differentiate exactly like the reference."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 24)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(2, 24)), jnp.float32)
    p = _params(rng, 24, 24, with_res=False)
    np.testing.assert_allclose(
        np.asarray(fused_resnet_block(x, emb, p)),
        np.asarray(resnet_block_reference(x, emb, p)),
        atol=1e-6,
    )

    def loss_fused(p_):
        return jnp.sum(fused_resnet_block(x, emb, p_) ** 2)

    def loss_ref(p_):
        return jnp.sum(resnet_block_reference(x, emb, p_) ** 2)

    g_f = jax.grad(loss_fused)(p)
    g_r = jax.grad(loss_ref)(p)
    for k in p:
        np.testing.assert_allclose(
            np.asarray(g_f[k]), np.asarray(g_r[k]), atol=1e-4, rtol=1e-4
        )


def test_module_fused_flag_matches_and_keeps_param_tree(rng):
    """PoseUNet(fused_resnet=True) produces the identical param tree and
    (via the CPU XLA dispatch) identical outputs + finite grads."""
    from nope_tpu.models.unet import PoseUNet

    x = jnp.asarray(rng.normal(size=(2, 16, 16, 4)), jnp.float32)
    pose = jnp.asarray(rng.normal(size=(2, 6)), jnp.float32)
    base = PoseUNet(u_net_dim=16, channels=4, dim_mults=(1, 2), resnet_block_groups=8)
    fused = PoseUNet(u_net_dim=16, channels=4, dim_mults=(1, 2),
                     resnet_block_groups=8, fused_resnet=True)
    v = base.init(jax.random.key(0), x, pose)
    v_fused = fused.init(jax.random.key(0), x, pose)
    assert jax.tree.structure(v) == jax.tree.structure(v_fused)

    a = base.apply(v, x, pose)
    b = fused.apply(v, x, pose)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4)

    g = jax.grad(lambda vv: jnp.sum(fused.apply({"params": vv["params"]}, x, pose) ** 2))(v)
    assert all(np.isfinite(l).all() for l in jax.tree.leaves(g))


def test_channel_change_requires_res(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    p = _params(rng, 16, 24, with_res=False)
    with pytest.raises(ValueError, match="res_w"):
        resnet_block_pallas(x, None, p, interpret=True)
