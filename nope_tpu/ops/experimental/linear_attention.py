"""Fused linear-attention inner kernel (Pallas TPU).

The default U-Net applies lucidrains-style linear attention at every
resolution (``model_utils.py:393-418``).  Its inner chain — two
softmaxes, the (d, e) context contraction and the token-wise output
projection — is a string of small ops over large (B, N, C) tensors; XLA
executes it as several HBM round-trips.  Measured on a v5e this makes
attention ~34% of the template-sweep U-Net's runtime (docs/PERFORMANCE.md).

This kernel fuses everything between the qkv 1x1 conv and the output
1x1 conv into a single VMEM-resident pass per batch tile:

    q = softmax_d(q) * d^-0.5 ; k = softmax_n(k)
    context = kᵀ v  (d, e)    ; out = q context  (n, e)

Layouts follow the reference's heads-major channel split, so the fused
path is numerically interchangeable with the unfused module (tested in
interpret mode and on hardware).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20)
except Exception:  # pragma: no cover
    _COMPILER_PARAMS = None


def _kernel(qkv_ref, out_ref, *, heads: int, dim_head: int):
    hidden = heads * dim_head
    scale = dim_head**-0.5
    for b in range(qkv_ref.shape[0]):  # small static batch tile
        for h in range(heads):
            sl = slice(h * dim_head, (h + 1) * dim_head)
            q = qkv_ref[b, :, sl]  # (n, d)
            k = qkv_ref[b, :, hidden + h * dim_head : hidden + (h + 1) * dim_head]
            v = qkv_ref[b, :, 2 * hidden + h * dim_head : 2 * hidden + (h + 1) * dim_head]

            q = jax.nn.softmax(q, axis=-1) * scale  # over channels (d)
            k = jax.nn.softmax(k, axis=0)  # over tokens (n)
            context = jnp.dot(k.T, v, preferred_element_type=jnp.float32)  # (d, e)
            out = jnp.dot(q, context, preferred_element_type=jnp.float32)  # (n, e)
            out_ref[b, :, sl] = out.astype(out_ref.dtype)


def linear_attention_inner(
    qkv: jax.Array,
    heads: int,
    dim_head: int,
    block_b: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """(B, N, 3*heads*dim_head) qkv tokens → (B, N, heads*dim_head).

    Matches the composition in ``blocks.LinearAttention`` between its
    two 1x1 convs.  N must be a multiple of 8 and heads*dim_head a
    multiple of 128 (the default U-Net uses 4x32 = 128).
    """
    b, n, three_hidden = qkv.shape
    hidden = heads * dim_head
    assert three_hidden == 3 * hidden
    # bound the VMEM footprint: double-buffered in+out tiles + per-head
    # temporaries must stay within the raised scoped limit
    tile_bytes = n * (three_hidden + hidden) * qkv.dtype.itemsize
    while block_b > 1 and block_b * tile_bytes * 2 > 24 * 2**20:
        block_b //= 2
    while b % block_b:
        block_b -= 1
    grid = (b // block_b,)
    kwargs = {}
    if _COMPILER_PARAMS is not None and not interpret:
        kwargs["compiler_params"] = _COMPILER_PARAMS
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, dim_head=dim_head),
        out_shape=jax.ShapeDtypeStruct((b, n, hidden), qkv.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((block_b, n, three_hidden), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((block_b, n, hidden), lambda i: (i, 0, 0)),
        interpret=interpret,
        **kwargs,
    )(qkv)


def linear_attention_inner_xla(
    qkv: jax.Array, heads: int, dim_head: int
) -> jax.Array:
    """Reference XLA composition (identical math, for fallback/tests)."""
    b, n, _ = qkv.shape
    hidden = heads * dim_head
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split(t):  # heads-major channel split
        return jnp.transpose(t.reshape(b, n, heads, dim_head), (0, 2, 3, 1))

    q, k, v = split(q), split(k), split(v)  # (b, h, d, n)
    q = jax.nn.softmax(q, axis=-2) * dim_head**-0.5
    k = jax.nn.softmax(k, axis=-1)
    context = jnp.einsum("bhdn,bhen->bhde", k, v)
    out = jnp.einsum("bhde,bhdn->bhen", context, q)  # (b, h, e, n)
    return jnp.transpose(out, (0, 3, 1, 2)).reshape(b, n, hidden)
