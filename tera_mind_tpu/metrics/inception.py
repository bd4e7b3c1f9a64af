"""Flax InceptionV3 feature extractor (pool3, 2048-d) for d-FID on TPU.

The reference evaluates d-FID with a torchscript InceptionV3 on GPU
(feat_mba.py:29-92).  This is the same architecture in flax so feature
extraction rides the TPU; weights convert from the torchscript export's
``named_parameters()``/``named_buffers()`` via
:func:`convert_torch_inception` (no torchvision dependency).

Weight files cannot be downloaded in this environment, so numerics against
the original cannot be golden-tested here; the architecture (shapes,
parameter inventory) is tested, and the converter is keyed to the standard
``Conv2d_1a_3x3 ... Mixed_7c`` naming used by both torchvision and the
NVlabs FID export.

Input convention: (B, 299, 299, 3) channels-last in [-1, 1] (the FID
convention; the reference resizes and rescales the same way,
feat_mba.py:182-209).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicConv2d(nn.Module):
    out: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.padding
        if isinstance(p, int):
            pad = [(p, p), (p, p)]
        else:
            pad = [(p[0], p[0]), (p[1], p[1])]  # symmetric per spatial dim
        x = nn.Conv(self.out, self.kernel, strides=(self.stride,) * 2,
                    padding=pad, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.9, name="bn")(x)
        return nn.relu(x)


def _avg_pool_3x3(x: jnp.ndarray, exclude_pad: bool) -> jnp.ndarray:
    """3x3 stride-1 avg pool, SAME.  ``exclude_pad`` matches the NVlabs FID
    blocks (count_include_pad=False); torchvision uses include-pad."""
    import jax
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), "SAME")
    if exclude_pad:
        ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
        cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                    (1, 1, 1, 1), "SAME")
        return s / cnt
    return s / 9.0


def _max_pool(x: jnp.ndarray, k: int, s: int) -> jnp.ndarray:
    import jax
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, k, k, 1),
                                 (1, s, s, 1), "VALID")


class InceptionA(nn.Module):
    pool_features: int
    exclude_pad: bool = True

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1),
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1),
                         name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3(x, self.exclude_pad)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1),
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int
    exclude_pad: bool = True

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0),
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3),
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0),
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3),
                         name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3(x, self.exclude_pad)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3),
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0),
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    exclude_pad: bool = True
    pool_max: bool = False   # NVlabs FIDInceptionE_2 uses max pool

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1),
                          name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0),
                          name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1),
                         name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1),
                          name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0),
                          name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_max:
            import jax
            bp = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                       (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
        else:
            bp = _avg_pool_3x3(x, self.exclude_pad)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Backbone up to the 2048-d global-average pool (FID features)."""

    fid_variant: bool = True  # NVlabs pooling semantics

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ep = self.fid_variant
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, exclude_pad=ep, name="Mixed_5b")(x)
        x = InceptionA(64, exclude_pad=ep, name="Mixed_5c")(x)
        x = InceptionA(64, exclude_pad=ep, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, exclude_pad=ep, name="Mixed_6b")(x)
        x = InceptionC(160, exclude_pad=ep, name="Mixed_6c")(x)
        x = InceptionC(160, exclude_pad=ep, name="Mixed_6d")(x)
        x = InceptionC(192, exclude_pad=ep, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(exclude_pad=ep, name="Mixed_7b")(x)
        x = InceptionE(exclude_pad=ep, pool_max=self.fid_variant,
                       name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))  # (B, 2048)


def convert_torch_inception(named_params: Dict[str, np.ndarray],
                            named_buffers: Dict[str, np.ndarray]) -> Dict:
    """Map a torch InceptionV3 state (torchvision or NVlabs torchscript
    layout: ``Mixed_5b.branch1x1.conv.weight`` etc.) to this module's
    variables ``{'params': ..., 'batch_stats': ...}``.

    Pass ``dict(ts.named_parameters())`` / ``dict(ts.named_buffers())`` of
    the loaded torchscript module (tensors converted to numpy by caller).
    """
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    for name, w in named_params.items():
        parts = name.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            put(params, parts[:-1] + ["kernel"],
                np.transpose(w, (2, 3, 1, 0)).copy())
        elif parts[-2] == "bn":
            key = {"weight": "scale", "bias": "bias"}.get(parts[-1])
            if key:
                put(params, parts[:-1] + [key], np.asarray(w).copy())
    for name, w in named_buffers.items():
        parts = name.split(".")
        if parts[-2] == "bn":
            key = {"running_mean": "mean", "running_var": "var"}.get(
                parts[-1])
            if key:
                put(stats, parts[:-1] + [key], np.asarray(w).copy())
    return {"params": params, "batch_stats": stats}


class FlaxInceptionFeatures:
    """metrics.features-compatible extractor running on the TPU.

    weights: path to a torchscript InceptionV3 export (NVlabs FID weights)
    whose parameters are converted on load.
    """

    dim = 2048

    def __init__(self, weights: str):
        import jax
        import torch

        ts = torch.jit.load(weights, map_location="cpu")
        npar = {k: v.detach().numpy() for k, v in ts.named_parameters()}
        nbuf = {k: v.detach().numpy() for k, v in ts.named_buffers()}
        # strip an optional leading wrapper attr (e.g. 'layers.')
        strip = None
        for k in npar:
            if k.startswith("Conv2d_1a_3x3"):
                strip = ""
                break
            if ".Conv2d_1a_3x3" in k:
                strip = k.split("Conv2d_1a_3x3")[0]
                break
        if strip:
            npar = {k[len(strip):]: v for k, v in npar.items()
                    if k.startswith(strip)}
            nbuf = {k[len(strip):]: v for k, v in nbuf.items()
                    if k.startswith(strip)}
        self.variables = convert_torch_inception(npar, nbuf)
        self.model = InceptionV3Features()
        self._apply = jax.jit(
            lambda v, x: self.model.apply(v, x))

    def __call__(self, batch: np.ndarray) -> np.ndarray:
        import jax.image

        x = np.asarray(batch, np.float32)
        if x.ndim == 3:
            x = np.repeat(x[..., None], 3, axis=-1)
        elif x.shape[-1] == 1:
            x = np.repeat(x, 3, axis=-1)
        xj = jnp.asarray(x)
        xj = jax.image.resize(xj, (x.shape[0], 299, 299, x.shape[-1]),
                              "bilinear")
        return np.asarray(self._apply(self.variables, xj))
