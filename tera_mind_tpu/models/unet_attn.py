"""Gene-gene attention extraction variant (``method='ours_vis'``).

Runs only the (shared, trained) gene-gene attention block of the RNA tower
and returns the raw GxG attention matrices for biological pathway analysis
(GLUT/DOPA/BLOD), for 3 sliding z-pairs plus the full z ensemble
(reference model/unet_attn.py:137-173, test_attn.py).

The block's parameters live under ``rna_tower/gene_attn`` in a trained
:class:`~tera_mind_tpu.models.unet.TeraUNet`; use
:func:`extractor_params_from_unet` to slice them out.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from .attention import GeneGeneBlock
from .rna import rna_grid_from_dense


class GeneAttnExtractor(nn.Module):
    """Returns (attn_stack, rna_core).

    attn_stack: (n_groups, B, G, G) — gene-gene attention for each sliding
      z-pair [i, i+2) and finally for all z slices together
      (reference unet_attn.py:164-173).
    rna_core: (B, Z-2, gh, gw, G) — the gene grid minus boundary slices.
    """

    rna_num: int
    z_rna: int
    gn_sz: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rna_dense: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        rna_h = rna_grid_from_dense(rna_dense.astype(self.dtype),
                                    self.z_rna, self.rna_num)
        block = GeneGeneBlock(
            hidden_size=self.gn_sz * self.gn_sz * self.z_rna,
            z_size=self.z_rna, dtype=self.dtype, name="gene_attn")

        attns = []
        for i in range(self.z_rna - 1):
            masked = jnp.zeros_like(rna_h)
            masked = masked.at[:, i:i + 2].set(rna_h[:, i:i + 2])
            _, attn = block(masked, return_attn=True)
            attns.append(attn[:, 0])  # drop the single-head axis
        _, attn = block(rna_h, return_attn=True)
        attns.append(attn[:, 0])
        return jnp.stack(attns), rna_h[:, 1:-1]


def extractor_params_from_unet(unet_params: dict) -> dict:
    """Slice a trained TeraUNet param tree down to the extractor's tree."""
    p = unet_params["params"] if "params" in unet_params else unet_params
    return {"params": {"gene_attn": p["rna_tower"]["gene_attn"]}}
