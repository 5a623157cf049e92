"""Experimental Pallas kernels — the attic (round-3 decision).

Three hand-written TPU kernels live here, each correct on hardware and
each MEASURED SLOWER than XLA's own fusion at this model's shapes
(docs/PERFORMANCE.md "Scoring kernel", "Wave-2 findings", "Round-2
fused ResnetBlock", "Round-3 Pallas disposition"):

- :mod:`pallas_similarity` — fused reference-metric scoring.  Final
  measurement in its best-case home (serving-owned CHANNEL-FIRST bf16
  banks, zero boundary transposes): 2.12 ms vs XLA 1.19 ms at
  B=64/N=341 (84 vs 150 GB/s effective), end-to-end serving 142.7 vs
  144.6 q/s — XLA's elementwise→reduce fusion wins even with the
  layout argument removed.
- :mod:`linear_attention` — in-context 530 vs 397 ms (XLA) U-Net.
- :mod:`fused_resnet` — 0.73-1.02x XLA across the block shapes.

They are kept because the negative result is load-bearing knowledge
(the VJP/param-tree/implicit-GEMM machinery is real and tested), but
nothing in the production path imports them; the opt-in model flags
(``PoseUNet(fused_attention=True, fused_resnet=True)``) resolve here.
"""
