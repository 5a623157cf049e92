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

- :func:`reference_similarity` — exact reference semantics, XLA.  XLA's
  elementwise→reduce fusion streams the bank in one pass and beat every
  hand-written Pallas variant measured over three rounds, including the
  channel-first serving configuration built specifically to remove the
  kernel's boundary transpose (84 vs 150 GB/s at B=64/N=341 —
  docs/PERFORMANCE.md); the retired kernel lives in
  :mod:`nope_tpu.ops.experimental.pallas_similarity`.
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


def reference_similarity(query: jax.Array, bank: jax.Array) -> jax.Array:
    """(B, h, w, C) x (B, N, h, w, C) → (B, N), reference semantics."""
    diff2 = jnp.square(query[:, None] - bank)
    chan = jnp.sqrt(jnp.sum(jnp.square(diff2), axis=-1))  # (B, N, h, w)
    return -jnp.sum(chan, axis=(-2, -1))


# canonical implementation alias kept for callers/tests that compare
# implementations explicitly
reference_similarity_xla = reference_similarity


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
