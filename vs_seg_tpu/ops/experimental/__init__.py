"""Measured-negative / superseded kernels, kept with code and exactness
tests as the experiment record (VERDICT r4 item 6).  Nothing here is on the
default path; each module's gate docstring carries its bench numbers and
the mechanism of its loss (docs/KERNELS.md has the full tables):

  pallas_block2d  kd=1 full-block mega-kernels (2.7-3.4x bench regression:
                  halo-recompute + boundary copies at 384x384)
  pallas_tail2d   kd=1 decoder tail, tap-packed (r5: boundary layout flip
                  of the folded-2D neighbors, -79%)
  pallas_dsconv   strided boundary conv (r4: -4-5% on the bench path)
  pallas_train    train-mode Pallas conv backward (r4: 432 vs 344 ms step)
  pallas_att      fused conv2+sigmoid+gate tail (r3: 185 vs 95 ms)
  widthpack       W-packed conv formulation (r2: wins 3-11% isolated, not
                  in context)
  grouped_conv    grouped-Toeplitz conv math (r1-2: HBM-resident im2col is
                  memory-bound)

The production import graph is ops/{pallas_blend, pallas_l2block,
pallas_rublock, pallas_conv333, blockmats, halo} only.
"""
