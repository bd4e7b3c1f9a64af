"""RNA tower: sparse-binned gene grids -> multiscale conditioning features.

Stage 0 is a gene-gene attention block followed by a z-collapse conv and a
2x spatial upsample; stages 1-3 are SiLU + Conv3d(1,3,3) + upsample chains
producing channels (rna_num, 128, 64, 32) at the four UNet resolutions
(reference model/unet_ours.py:277-323).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..constants import M2H
from .attention import GeneGeneBlock
from .nn import conv3d, upsample_2x


def rna_grid_from_dense(rna_dense: jnp.ndarray, z_rna: int,
                        rna_num: int) -> jnp.ndarray:
    """(B, gh, gw, Z*G) z-major gene channels -> (B, Z, gh, gw, G').

    Mirrors ``get_rna``'s densify+rearrange and human-gene subsetting
    (reference unet_ours.py:298-323): if the model's gene panel is smaller
    than the data's, select the M2H indices (human transfer, 81 genes) or
    the first ``rna_num`` genes (229-plex mice carried in 500-gene arrays).
    """
    b, gh, gw, zg = rna_dense.shape
    g = zg // z_rna
    x = rna_dense.reshape(b, gh, gw, z_rna, g)
    x = x.transpose(0, 3, 1, 2, 4)  # (B, Z, gh, gw, G)
    if rna_num != g:
        if rna_num == len(M2H):
            x = x[..., jnp.asarray(M2H)]
        else:
            x = x[..., :rna_num]
    return x


class RNATower(nn.Module):
    """Four-stage conditioning tower.

    Output list (channels-last, z collapsed to ceil(z_rna/2)):
      [0] (B, z2,  2*gn,  2*gn, rna_num)   for UNet resolution patch/8
      [1] (B, z2,  4*gn,  4*gn, 128)       for patch/4
      [2] (B, z2,  8*gn,  8*gn, 64)        for patch/2
      [3] (B, z2, 16*gn, 16*gn, 32)        for patch/1
    """

    rna_num: int
    z_rna: int          # number of RNA z-slices (len(rna_tpl))
    gn_sz: int          # gene grid size per patch (patch_size // 16)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rna_grid: jnp.ndarray, *, return_attn: bool = False
                 ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray],
                            Optional[jnp.ndarray]]:
        """Returns (feats, pres, attn) with feats[i] == upsample_2x(pres[i]).

        ``pres`` (the pre-upsample stage outputs) let consumers commute
        spatial reshuffles with the upsample — the decoder collages pres at
        quarter the elements (to_collage∘upsample == upsample∘to_collage
        exactly for the even shapes here; tests/test_collage.py)."""
        och = [self.rna_num, 128, 64, 32]
        h, attn = GeneGeneBlock(
            hidden_size=self.gn_sz * self.gn_sz * self.z_rna,
            z_size=self.z_rna, dtype=self.dtype, name="gene_attn")(
                rna_grid, return_attn=return_attn)
        pres = [h]
        h = upsample_2x(h)
        feats = [h]
        for rid in range(1, 4):
            h = nn.silu(h)
            h = conv3d(och[rid], (1, 3, 3), dtype=self.dtype,
                       name=f"conv_{rid}")(h)
            pres.append(h)
            h = upsample_2x(h)
            feats.append(h)
        return feats, pres, attn
