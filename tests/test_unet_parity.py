"""Checkpoint-port parity: torch oracle U-Net → port tool → Flax PoseUNet.

The north-star gate (BASELINE.md): a reference-format PyTorch
checkpoint, ported with :mod:`nope_tpu.training.port`, must reproduce
the reference outputs within fp32 tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from nope_tpu.models.unet import PoseUNet
from nope_tpu.training import port
from tests.oracles.torch_pose_unet import TorchPoseUNet

# tiny config: 16-dim U-Net, 2 resolutions, 16x16 latents
DIM, CHANNELS, MULTS, GROUPS = 16, 4, (1, 2), 8


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = TorchPoseUNet(
        u_net_dim=DIM, channels=CHANNELS, rot_dim=6, dim_mults=MULTS, groups=GROUPS
    )
    model.eval()
    return model


@pytest.fixture(scope="module")
def flax_model():
    return PoseUNet(
        u_net_dim=DIM,
        channels=CHANNELS,
        rot_representation_dim=6,
        dim_mults=MULTS,
        resnet_block_groups=GROUPS,
        double_bottleneck=True,
    )


def _ported_params(torch_model, flax_model, mults=MULTS):
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    ported = port.port_pose_unet(sd, dim_mults=mults)
    template = flax_model.init(
        jax.random.key(0),
        jnp.zeros((1, 16, 16, CHANNELS)),
        jnp.zeros((1, 6)),
    )["params"]
    port.assert_tree_shapes_match(ported, template)
    return {"params": jax.tree.map(jnp.asarray, ported)}


def test_port_shapes_and_full_forward_parity(torch_model, flax_model, rng):
    variables = _ported_params(torch_model, flax_model)
    x = rng.normal(size=(2, CHANNELS, 16, 16)).astype(np.float32)
    pose = rng.normal(size=(2, 6)).astype(np.float32)

    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x), torch.from_numpy(pose)).numpy()

    with jax.default_matmul_precision("highest"):
        out = flax_model.apply(
            variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(pose)
        )
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))

    assert out.shape == ref.shape == (2, CHANNELS, 16, 16)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_single_bottleneck_differs(torch_model, rng):
    """double_bottleneck=False must change the output (guards against the
    quirk silently disappearing)."""
    single = PoseUNet(
        u_net_dim=DIM,
        channels=CHANNELS,
        rot_representation_dim=6,
        dim_mults=MULTS,
        resnet_block_groups=GROUPS,
        double_bottleneck=False,
    )
    double = PoseUNet(
        u_net_dim=DIM,
        channels=CHANNELS,
        rot_representation_dim=6,
        dim_mults=MULTS,
        resnet_block_groups=GROUPS,
        double_bottleneck=True,
    )
    x = jnp.asarray(rng.normal(size=(1, 16, 16, CHANNELS)).astype(np.float32))
    pose = jnp.asarray(rng.normal(size=(1, 6)).astype(np.float32))
    variables = single.init(jax.random.key(1), x, pose)
    a = single.apply(variables, x, pose)
    b = double.apply(variables, x, pose)  # same params, two passes
    assert float(jnp.max(jnp.abs(a - b))) > 1e-4


def test_pose_conditioning_affects_output(torch_model, flax_model, rng):
    variables = _ported_params(torch_model, flax_model)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, CHANNELS)).astype(np.float32))
    p1 = jnp.zeros((1, 6))
    p2 = jnp.ones((1, 6))
    o1 = flax_model.apply(variables, x, p1)
    o2 = flax_model.apply(variables, x, p2)
    assert float(jnp.max(jnp.abs(o1 - o2))) > 1e-3


def test_remat_preserves_outputs_and_grads(rng):
    """remat=True must be numerically identical (same params) with
    finite gradients."""
    base = PoseUNet(u_net_dim=DIM, channels=CHANNELS, dim_mults=MULTS,
                    resnet_block_groups=GROUPS, remat=False)
    rematted = PoseUNet(u_net_dim=DIM, channels=CHANNELS, dim_mults=MULTS,
                        resnet_block_groups=GROUPS, remat=True)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, CHANNELS)).astype(np.float32))
    pose = jnp.asarray(rng.normal(size=(1, 6)).astype(np.float32))
    v = base.init(jax.random.key(0), x, pose)
    out_a = base.apply(v, x, pose)
    out_b = rematted.apply(v, x, pose)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    g = jax.grad(lambda v: jnp.sum(rematted.apply(v, x, pose) ** 2))(v)
    assert all(np.isfinite(l).all() for l in jax.tree.leaves(g))


def test_port_parity_three_levels(rng):
    """Port mapping at depth 3 (dim_mults=(1,2,4)) — exercises the
    mid-depth down/upsample indices the 2-level test can't."""
    torch.manual_seed(3)
    oracle = TorchPoseUNet(
        u_net_dim=16, channels=4, rot_dim=6, dim_mults=(1, 2, 4), groups=8
    )
    oracle.eval()
    model = PoseUNet(
        u_net_dim=16, channels=4, rot_representation_dim=6, dim_mults=(1, 2, 4),
        resnet_block_groups=8, double_bottleneck=True,
    )
    variables = _ported_params(oracle, model, mults=(1, 2, 4))

    x = rng.normal(size=(1, 4, 16, 16)).astype(np.float32)
    pose = rng.normal(size=(1, 6)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x), torch.from_numpy(pose)).numpy()
    with jax.default_matmul_precision("highest"):
        out = model.apply(
            variables,
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(pose),
        )
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, atol=3e-4, rtol=1e-3
    )
