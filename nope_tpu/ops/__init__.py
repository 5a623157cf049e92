"""TPU compute kernels (Pallas) with pure-XLA reference fallbacks."""

from nope_tpu.ops.similarity import (  # noqa: F401
    reference_similarity,
    l2_similarity,
    cosine_similarity,
    retrieve,
)
