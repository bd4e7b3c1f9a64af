"""Tera-MIND TPU: a TPU-native JAX framework for tera-scale mRNA-guided
patch-wise diffusion of whole mouse-brain microscopy volumes.

This is a from-scratch TPU-first rebuild with the capabilities of the
CTPLab/Tera-MIND reference (arXiv:2503.01220):

- patch-wise DDPM/DDIM with dual-decoder "collage" UNet (seamless
  arbitrarily-large generation from 64x64 patch training),
- spatially-resolved mRNA (MERFISH) conditioning through a multiscale RNA
  tower with gene-gene attention and DiT-style adaLN cross-attention,
- a timestep-major tera-scale sampling loop over the 286x414 whole-brain
  tile grid, rebuilt as an in-memory sharded state with collective halo
  exchange over a TPU mesh (instead of the reference's filesystem halo),
- gene-gene attention-matrix extraction for pathway analysis,
- training harness, metrics (d-FID / PSNR / SSIM / MS-SSIM), WSI assembly.

Layout convention: feature maps are channels-last ``(B, Z, H, W, C)``
(TPU/XLA-native), vs. the reference's torch ``(B, C, Z, H, W)``.
"""

__version__ = "0.1.0"
