"""Fused Pallas reference-metric similarity — ATTIC (see package
docstring for the round-3 disposition).

One HBM pass over a channel-first bank, no (B, N, h, w, C) difference
intermediate.  Correct on v5e (rel err 3e-7 at N=341) and measured
SLOWER than XLA's own fusion both standalone (111 vs 207 GB/s,
round 1) and in its best-case home — serving-owned channel-first bf16
banks with the boundary transpose eliminated (84 vs 150 GB/s,
2.12 vs 1.19 ms at B=64/N=341; serving end-to-end 142.7 vs 144.6 q/s,
round 3).  The production path (:mod:`nope_tpu.ops.similarity`) is
XLA-only.

Tiling notes: TPU blocks must have their last two dims (8, 128)-aligned
or span the full array dimension, and *lane*-dim stores need statically
128-aligned indices — so the dynamic per-batch index lands on the
sublane dim: output (B, N_pad) with N padded to a multiple of 128,
block (B, BLOCK_N), a dynamic-sublane row store per program.  The batch
grid axis is the fast axis, so each output tile stays resident in VMEM
while all B rows are filled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ref_sim_kernel(q_ref, bank_ref, out_ref):
    # channel-FIRST tiles: (C, S) with the large S on the lane dim —
    # with C minormost, every (.., S, C=4) VMEM buffer would pad C to
    # 128 lanes (a 32x footprint blow-up; v5e VMEM OOM at N=341).
    j = pl.program_id(1)  # batch index → sublane row of the out tile
    # Loads keep the INPUT dtype (a bf16 bank streams half the HBM
    # bytes) but compute is ALWAYS f32: Mosaic crashes outright on the
    # packed-bf16 elementwise/reduce chain at these shapes
    # (tpu_compile_helper exit 1, verified on v5e), while bf16-load →
    # f32-upcast-in-VMEM compiles and runs.
    q = q_ref[0].astype(jnp.float32)  # (C, S)
    t = bank_ref[0].astype(jnp.float32)  # (BLOCK_N, C, S)
    d2 = jnp.square(q[None] - t)
    chan = jnp.sqrt(jnp.sum(jnp.square(d2), axis=1))  # (BLOCK_N, S)
    # out_ref is ALWAYS f32: a dynamic single-row store needs one full
    # 32-bit sublane — with a packed bf16 out tile (2 rows/word) Mosaic
    # rejects the unaligned row store ("index in dimension 0 is a
    # multiple of 8").
    out_ref[pl.ds(j, 1), :] = -jnp.sum(chan, axis=-1)[None, :]


def _pick_block_n(n_pad: int, bytes_per_template: int, vmem_budget: int = 4 * 2**20) -> int:
    block = max(128, min(n_pad, vmem_budget // max(bytes_per_template, 1)))
    block = (block // 128) * 128
    while n_pad % block:
        block -= 128
    return max(block, 128)


def reference_similarity_pallas(
    query: jax.Array, bank: jax.Array, block_n: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused reference-metric similarity.  ``query``: (B, h, w, C),
    ``bank``: (B, N, h, w, C) (any layout whose trailing dims flatten to
    (S, C) consistently between the two)."""
    b, *spatial, c = query.shape
    n = bank.shape[1]
    s = 1
    for d in spatial:
        s *= d
    # channel-first (C, S): one XLA transpose pass over the bank, fused
    # into the bank-producing epilogue under jit
    q = query.reshape(b, s, c).transpose(0, 2, 1)
    t = bank.reshape(b, n, s, c).transpose(0, 1, 3, 2)
    return reference_similarity_pallas_cf(q, t, block_n=block_n,
                                          interpret=interpret)


def reference_similarity_pallas_cf(
    q: jax.Array, t: jax.Array, block_n: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Channel-first entry: ``q`` (B, C, S), ``t`` (B, N, C, S) — no
    boundary transpose.  This was the kernel's best-case configuration
    and the one the round-3 serving measurement retired (module
    docstring)."""
    b, c, s = q.shape
    n = t.shape[1]

    n_pad = -(-n // 128) * 128
    if n_pad != n:
        t = jnp.pad(t, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)))
    if block_n is None:
        block_n = _pick_block_n(n_pad, bytes_per_template=s * c * q.dtype.itemsize)

    grid = (n_pad // block_n, b)
    out = pl.pallas_call(
        _ref_sim_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, s), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, block_n, c, s), lambda i, j: (j, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((b, block_n), lambda i, j: (0, i)),
        interpret=interpret,
    )(q, t)
    return out[:, :n]
