"""Fused ResnetBlock kernel: the whole conv→GN→SiLU→(+emb)→conv→GN→SiLU→(+res)
chain in one VMEM-resident Pallas program per batch element.

This is the conv↔GroupNorm boundary fusion XLA cannot do
(docs/PERFORMANCE.md): GroupNorm needs data-dependent statistics of a
conv *output*, which forces XLA to materialise every intermediate in
HBM.  Because a GroupNorm reduces over (H, W, C/G) *per sample*, a
program that owns one batch element's full spatial extent can compute
the statistics in VMEM — so the entire reference ResnetBlock
(``model_utils.py:237-279``: two conv3x3+GN+SiLU "Blocks", the additive
conditioning embedding between them, and the 1x1-conv residual) runs as
one kernel that reads x once and writes the output once.

Kernel recipe per program (grid over batch):

- conv3x3 as 9 shifted MXU matmuls over a zero-padded VMEM scratch
  (implicit GEMM; K/N = channel dims, M = H*W)
- GroupNorm statistics via MXU: channel sums → (C, G) one-hot group
  matmul → per-group mean/rstd → per-channel affine folded with the GN
  gamma/beta (no lane-dimension reshapes)
- SiLU + additive embedding on the VPU, second conv, second GN, SiLU,
  then the (optionally 1x1-projected) residual add

Gradients: :func:`fused_resnet_block` carries a ``jax.custom_vjp``
whose backward recomputes through the XLA reference implementation —
numerically identical math, so training under the fused flag is exact.

Dispatch: on non-TPU backends (or ``use_pallas=False``) the XLA
reference implementation runs instead; ``interpret=True`` exercises the
kernel on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # pragma: no cover - exercised on TPU / in interpret tests
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


# ---------------------------------------------------------------------------
# XLA reference implementation (also the custom-vjp backward path)
# ---------------------------------------------------------------------------


def _group_norm(h: jax.Array, gamma: jax.Array, beta: jax.Array,
                groups: int, eps: float) -> jax.Array:
    b, hh, ww, c = h.shape
    hg = h.reshape(b, hh * ww, groups, c // groups)
    mean = jnp.mean(hg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(hg - mean), axis=(1, 3), keepdims=True)
    normed = (hg - mean) / jnp.sqrt(var + eps)
    return normed.reshape(b, hh, ww, c) * gamma + beta


def resnet_block_reference(
    x: jax.Array,
    emb: Optional[jax.Array],
    params: Dict[str, jax.Array],
    groups: int = 8,
    eps: float = 1e-5,
) -> jax.Array:
    """Plain-XLA ResnetBlock with explicit params (keys: w1/b1/g1/be1,
    w2/b2/g2/be2, optional res_w/res_b).  w*: (3, 3, Cin, Co) HWIO."""
    h = jax.lax.conv_general_dilated(
        x, params["w1"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["b1"]
    h = _group_norm(h, params["g1"], params["be1"], groups, eps)
    h = jax.nn.silu(h)
    if emb is not None:
        h = h + emb[:, None, None, :]
    h = jax.lax.conv_general_dilated(
        h, params["w2"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["b2"]
    h = _group_norm(h, params["g2"], params["be2"], groups, eps)
    h = jax.nn.silu(h)
    if "res_w" in params:
        res_w = params["res_w"]
        if res_w.ndim == 4:  # (1, 1, Cin, Co) conv kernel
            res_w = res_w.reshape(res_w.shape[-2], res_w.shape[-1])
        res = jnp.einsum("bhwc,cd->bhwd", x, res_w) + params["res_b"]
    else:
        res = x
    return h + res


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _conv3x3(pad_ref, h, w, w_ref, accum_dtype=jnp.float32):
    """(bp, H, W, Cin) padded scratch → (bp, H, W, Co): 9 shifted
    matmuls, each an (bp*H*W, Cin) x (Cin, Co) MXU contraction."""
    acc = None
    for k in range(9):
        dy, dx = k // 3, k % 3
        patch = pad_ref[:, dy:dy + h, dx:dx + w, :]
        term = jax.lax.dot_general(
            patch, w_ref[k],
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=accum_dtype,
        )
        acc = term if acc is None else acc + term
    return acc


def _gn_silu(h, gamma_ref, beta_ref, onehot_ref, hw, cg, eps):
    """GroupNorm(+affine)+SiLU with MXU-friendly PER-SAMPLE statistics.

    h: (bp, H, W, C) f32.  onehot_ref: (C, G) group membership.  Stats
    are per (sample, group) over H*W*Cg elements; the per-channel
    scale/shift fold gamma/beta with mean/rstd.
    """
    csum = jnp.sum(h, axis=(1, 2))  # (bp, C)
    csq = jnp.sum(h * h, axis=(1, 2))
    onehot = onehot_ref[:]
    gsum = jax.lax.dot_general(  # (bp, G)
        csum, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gsq = jax.lax.dot_general(
        csq, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    n = float(hw * cg)
    mean_g = gsum / n
    var_g = gsq / n - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # broadcast group stats back to channels: (bp, G) @ (G, C)
    rstd_c = jax.lax.dot_general(
        rstd_g, onehot.T, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bp, C)
    mean_c = jax.lax.dot_general(
        mean_g, onehot.T, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scale = gamma_ref[:] * rstd_c  # (1, C) * (bp, C)
    shift = beta_ref[:] - mean_c * scale
    return jax.nn.silu(h * scale[:, None, None, :] + shift[:, None, None, :])


def _make_kernel(h, w, c_in, c_out, groups, eps, has_emb, has_res, out_dtype):
    hw = h * w
    cg = c_out // groups

    def kernel(*refs):
        idx = 0
        x_ref = refs[idx]; idx += 1
        if has_emb:
            emb_ref = refs[idx]; idx += 1
        w1_ref = refs[idx]; b1_ref = refs[idx + 1]
        g1_ref = refs[idx + 2]; be1_ref = refs[idx + 3]
        w2_ref = refs[idx + 4]; b2_ref = refs[idx + 5]
        g2_ref = refs[idx + 6]; be2_ref = refs[idx + 7]
        idx += 8
        if has_res:
            rw_ref = refs[idx]; rb_ref = refs[idx + 1]; idx += 2
        onehot_ref = refs[idx]; idx += 1
        out_ref = refs[idx]; idx += 1
        pad1_ref, pad2_ref = refs[idx], refs[idx + 1]

        x = x_ref[:].astype(jnp.float32)  # (bp, H, W, Cin)

        pad1_ref[:] = jnp.zeros_like(pad1_ref)
        pad1_ref[:, 1:h + 1, 1:w + 1, :] = x
        h1 = _conv3x3(pad1_ref, h, w, w1_ref) + b1_ref[:]
        a = _gn_silu(h1, g1_ref, be1_ref, onehot_ref, hw, cg, eps)
        if has_emb:
            # cast before the rank-4 broadcast reshape (Mosaic can't
            # reshape sub-lane bf16 vectors to 4D)
            a = a + emb_ref[:].astype(jnp.float32)[:, None, None, :]

        pad2_ref[:] = jnp.zeros_like(pad2_ref)
        pad2_ref[:, 1:h + 1, 1:w + 1, :] = a
        h2 = _conv3x3(pad2_ref, h, w, w2_ref) + b2_ref[:]
        y = _gn_silu(h2, g2_ref, be2_ref, onehot_ref, hw, cg, eps)

        if has_res:
            res = jax.lax.dot_general(
                x, rw_ref[:], dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + rb_ref[:]
        else:
            res = x
        out_ref[:] = (y + res).astype(out_dtype)

    return kernel


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape))


_VMEM_BUDGET = 72 * 1024 * 1024  # leave headroom under the v5e's 128 MB


def _pick_samples_per_program(b, h, w, c_in, c_out):
    """Largest divisor of the batch whose working set fits the VMEM
    budget.  More samples per program = chunkier MXU matmuls
    (M = bp*H*W) and fewer per-program overheads."""
    weights = 4 * 9 * (c_in + c_out) * c_out
    per_sample = 4 * (
        (h + 2) * (w + 2) * (c_in + c_out)  # the two padded scratches
        + h * w * (2 * c_in + 3 * c_out)    # x, out, conv/act temporaries
    )
    bp = 1
    for cand in range(2, min(b, 64) + 1):
        if b % cand == 0 and weights + cand * per_sample <= _VMEM_BUDGET:
            bp = cand
    return bp


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "interpret", "samples_per_program")
)
def resnet_block_pallas(
    x: jax.Array,
    emb: Optional[jax.Array],
    params: Dict[str, jax.Array],
    groups: int = 8,
    eps: float = 1e-5,
    interpret: bool = False,
    samples_per_program: Optional[int] = None,
) -> jax.Array:
    """Fused programs over batch slices (see module docstring)."""
    b, h, w, c_in = x.shape
    c_out = params["w1"].shape[-1]
    has_emb = emb is not None
    has_res = "res_w" in params
    if not has_res and c_in != c_out:
        raise ValueError("channel change requires res_w")
    bp = samples_per_program or _pick_samples_per_program(b, h, w, c_in, c_out)
    if b % bp:
        raise ValueError(f"samples_per_program {bp} must divide batch {b}")

    w1 = params["w1"].reshape(9, c_in, c_out)
    w2 = params["w2"].reshape(9, c_out, c_out)
    onehot = jnp.asarray(
        np.repeat(np.eye(groups, dtype=np.float32), c_out // groups, axis=0)
    )  # (C, G)

    inputs = [x]
    in_specs = [pl.BlockSpec((bp, h, w, c_in), lambda i: (i, 0, 0, 0))]
    if has_emb:
        inputs.append(emb)
        in_specs.append(pl.BlockSpec((bp, c_out), lambda i: (i, 0)))
    def _vec(v):  # TPU wants >=2D operands: vectors ride as (1, C)
        return v.reshape(1, -1)

    inputs += [w1, _vec(params["b1"]), _vec(params["g1"]), _vec(params["be1"]),
               w2, _vec(params["b2"]), _vec(params["g2"]), _vec(params["be2"])]
    in_specs += [
        _const_spec((9, c_in, c_out)), _const_spec((1, c_out)),
        _const_spec((1, c_out)), _const_spec((1, c_out)),
        _const_spec((9, c_out, c_out)), _const_spec((1, c_out)),
        _const_spec((1, c_out)), _const_spec((1, c_out)),
    ]
    if has_res:
        res_w = params["res_w"]
        if res_w.ndim == 4:  # (1, 1, Cin, Co) conv kernel
            res_w = res_w.reshape(c_in, c_out)
        inputs += [res_w, _vec(params["res_b"])]
        in_specs += [_const_spec((c_in, c_out)), _const_spec((1, c_out))]
    inputs.append(onehot)
    in_specs.append(_const_spec((c_out, groups)))

    kernel = _make_kernel(
        h, w, c_in, c_out, groups, eps, has_emb, has_res, x.dtype
    )
    flops_conv = 2 * 9 * h * w * c_out * (c_in + c_out) * b
    return pl.pallas_call(
        kernel,
        grid=(b // bp,),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c_out), x.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bp, h, w, c_out), lambda i: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((bp, h + 2, w + 2, c_in), jnp.float32),
            pltpu.VMEM((bp, h + 2, w + 2, c_out), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_conv,
            bytes_accessed=(x.size + b * h * w * c_out) * x.dtype.itemsize,
            transcendentals=2 * b * h * w * c_out,  # the two SiLUs
        ),
        # weight-heavy blocks (e.g. the 576->384 up-block: ~17 MB of
        # conv weights + scratch) exceed the 16 MB default scoped-vmem
        # limit; the v5e has 128 MB of physical VMEM
        compiler_params=(
            None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            )
        ),
        interpret=interpret,
    )(*inputs)


# ---------------------------------------------------------------------------
# public entry: kernel forward, XLA-recompute backward
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_with_vjp(x, emb, params, groups, eps):
    return resnet_block_pallas(x, emb, params, groups=groups, eps=eps)


def _fused_fwd(x, emb, params, groups, eps):
    return _fused_with_vjp(x, emb, params, groups, eps), (x, emb, params)


def _fused_bwd(groups, eps, residuals, g):
    x, emb, params = residuals
    _, vjp = jax.vjp(
        lambda x_, emb_, p_: resnet_block_reference(x_, emb_, p_, groups, eps),
        x, emb, params,
    )
    return vjp(g)


_fused_with_vjp.defvjp(_fused_fwd, _fused_bwd)


def fused_resnet_block(
    x: jax.Array,
    emb: Optional[jax.Array],
    params: Dict[str, jax.Array],
    groups: int = 8,
    eps: float = 1e-5,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """ResnetBlock forward; Pallas-fused on TPU (XLA elsewhere), with
    exact gradients via the XLA reference VJP."""
    if use_pallas is None:
        use_pallas = _HAS_PLTPU and jax.default_backend() == "tpu"
    if not use_pallas:
        return resnet_block_reference(x, emb, params, groups, eps)
    return _fused_with_vjp(x, emb, params, groups, eps)
