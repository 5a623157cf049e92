"""TPU compute ops.  Production paths are pure XLA — measured faster
than every hand-written Pallas variant at this model's shapes; the
retired kernels live in :mod:`nope_tpu.ops.experimental` with their
measurements."""

from nope_tpu.ops.similarity import (  # noqa: F401
    reference_similarity,
    l2_similarity,
    cosine_similarity,
    retrieve,
)
