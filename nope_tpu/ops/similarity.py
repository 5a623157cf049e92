"""Template-bank similarity + retrieval.

The retrieval step of NOPE scores a query latent against the predicted
template bank and returns the top-k nearest viewpoints
(``/root/reference/src/model/model.py:254-266``).  The reference metric
is a quirk worth reproducing bit-for-bit for checkpoint parity:

    distance   = (q - t)²                  # elementwise
    distance   = ‖distance‖₂ over channels # i.e. sqrt(Σ_c (q-t)⁴)
    similarity = -Σ_{h,w} distance         # (B, N)

(the inner square-then-norm makes it an L4-flavoured channel reduction,
*not* plain L2 — see SURVEY appendix item 10).  We provide:

- :func:`reference_similarity` — exact reference semantics.  Backed by a
  fused Pallas TPU kernel (one HBM pass over the bank, no (B,N,C,h,w)
  intermediate) with an XLA fallback for CPU/debug.
- :func:`l2_similarity` — true negative squared-L2, expanded to
  ‖q‖² - 2q·t + ‖t‖² so the dominant term is a single MXU matmul.
- :func:`cosine_similarity` — normalized dot product (the config
  mentions "cosine" as an alternative metric).
- :func:`retrieve` — similarity + top-k indices, the full retrieval op.

Feature layout is NHWC: query (B, h, w, C), bank (B, N, h, w, C).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

try:  # TPU-only import; absent in some CPU-only environments
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


# ---------------------------------------------------------------------------
# XLA reference implementations
# ---------------------------------------------------------------------------


def reference_similarity_xla(query: jax.Array, bank: jax.Array) -> jax.Array:
    """(B, h, w, C) x (B, N, h, w, C) → (B, N), reference semantics."""
    diff2 = jnp.square(query[:, None] - bank)
    chan = jnp.sqrt(jnp.sum(jnp.square(diff2), axis=-1))  # (B, N, h, w)
    return -jnp.sum(chan, axis=(-2, -1))


def l2_similarity(query: jax.Array, bank: jax.Array) -> jax.Array:
    """True negative squared L2 distance, MXU-formulated."""
    b = query.shape[0]
    q = query.reshape(b, -1)
    t = bank.reshape(b, bank.shape[1], -1)
    qq = jnp.sum(q * q, axis=-1)[:, None]
    tt = jnp.sum(t * t, axis=-1)
    qt = jnp.einsum("bd,bnd->bn", q, t)
    return -(qq - 2.0 * qt + tt)


def cosine_similarity(query: jax.Array, bank: jax.Array, eps: float = 1e-8) -> jax.Array:
    b = query.shape[0]
    q = query.reshape(b, -1)
    t = bank.reshape(b, bank.shape[1], -1)
    qn = jnp.linalg.norm(q, axis=-1)[:, None]
    tn = jnp.linalg.norm(t, axis=-1)
    return jnp.einsum("bd,bnd->bn", q, t) / jnp.maximum(qn * tn, eps)


# ---------------------------------------------------------------------------
# fused Pallas kernel for the reference metric
# ---------------------------------------------------------------------------
#
# Grid: (N_pad // BLOCK_N, B).  Each program reads one query row (S, C)
# and one (BLOCK_N, S, C) bank tile into VMEM, computes
# -Σ_s sqrt(Σ_c (q-t)^4) per template, and writes row b of a
# (B, BLOCK_N) output tile.  One pass over the bank: the (B, N, h, w, C)
# difference tensor the XLA version materialises never exists.
#
# Tiling notes: TPU blocks must have their last two dims (8, 128)-
# aligned or span the full array dimension, and *lane*-dim stores need
# statically 128-aligned indices — so the dynamic per-batch index lands
# on the sublane dim: output (B, N_pad) with N padded to a multiple of
# 128, block (B, BLOCK_N), a dynamic-sublane row store per program.
# The batch grid axis is the fast axis, so each output tile stays
# resident in VMEM while all B rows are filled.


def _ref_sim_kernel(q_ref, bank_ref, out_ref):
    # channel-FIRST tiles: (C, S) with the large S on the lane dim —
    # with C minormost, every (.., S, C=4) VMEM buffer would pad C to
    # 128 lanes (a 32x footprint blow-up; v5e VMEM OOM at N=341).
    j = pl.program_id(1)  # batch index → sublane row of the out tile
    q = q_ref[0]  # (C, S)
    t = bank_ref[0]  # (BLOCK_N, C, S)
    d2 = jnp.square(q[None] - t)
    chan = jnp.sqrt(jnp.sum(jnp.square(d2), axis=1))  # (BLOCK_N, S)
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
    # into the bank-producing epilogue under jit (still 2 fewer HBM
    # round-trips than the materialised-difference XLA fallback)
    q = query.reshape(b, s, c).transpose(0, 2, 1)
    t = bank.reshape(b, n, s, c).transpose(0, 1, 3, 2)

    n_pad = -(-n // 128) * 128
    if n_pad != n:
        t = jnp.pad(t, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)))
    if block_n is None:
        block_n = _pick_block_n(n_pad, bytes_per_template=s * c * q.dtype.itemsize)

    grid = (n_pad // block_n, b)
    out = pl.pallas_call(
        _ref_sim_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, s), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, block_n, c, s), lambda i, j: (j, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((b, block_n), lambda i, j: (0, i)),
        interpret=interpret,
    )(q, t)
    return out[:, :n]


def reference_similarity(
    query: jax.Array, bank: jax.Array, use_pallas: bool | None = None
) -> jax.Array:
    """Reference-metric similarity.

    Default is the XLA implementation: measured on a v5e (B=16, N=341
    latent bank), XLA's elementwise→reduce fusion streams the bank in
    one pass at ~207 GB/s vs ~111 GB/s for the Pallas kernel, whose
    channel-first layout requires an extra transpose pass over the bank
    when invoked standalone.  The Pallas path (``use_pallas=True``)
    remains available for fusion into larger hand-scheduled pipelines
    where the bank is already channel-first.
    """
    if use_pallas and _HAS_PLTPU:
        return reference_similarity_pallas(query, bank)
    return reference_similarity_xla(query, bank)


_METRICS = {
    "l2": reference_similarity,  # the reference calls its quirk metric "l2"
    "l2_true": l2_similarity,
    "cosine": cosine_similarity,
}


def similarity_metric(name: str):
    """Look up a similarity function by config name ((B,h,w,C) query ×
    (B,N,h,w,C) bank → (B,N)); every metric reduces per-template, so
    callers may chunk the N axis exactly (see
    ``PoseConditionalTask.retrieve_streaming``)."""
    return _METRICS[name]


def retrieve(
    query: jax.Array, bank: jax.Array, k: int = 5, metric: str = "l2"
) -> Tuple[jax.Array, jax.Array]:
    """similarity (B, N) + top-k indices (B, k)
    (``model.py:254-266``)."""
    sim = _METRICS[metric](query, bank)
    _, idx = jax.lax.top_k(sim, k)
    return sim, idx
