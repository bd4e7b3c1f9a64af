"""z-packed TeraUNet: the flagship model with z folded into channels.

Same architecture and parameters as :class:`~.unet.TeraUNet`, but every
voxel tensor (B, Z, H, W, C) is carried as (B, H, W, Z*C).  Profiling
(scripts/profile_step.py) showed the 5D layout spends 76% of step time in
convs at ~28% MXU utilization — the z=2 dim wastes sublanes and a third
of every (3,3,3) kernel's z-taps hits padding.  Packed, the convs are
dense 2D (z absorbed into channels): the hot decoder conv drops 131->37ms
and the whole tera-step runs ~1.6x faster (0.159 vs 0.097 tiles/s,
mask-based grouped norms included; BASELINE.md ladder).

Layout: SEGMENT-MAJOR.  Every single tensor is z-major packed
(idx = zi*C + c); skip/rna concats are PLAIN ``jnp.concatenate`` along
channels, leaving each concatenated segment z-major internally.  The
channel permutation this implies (vs a z-major view of the concatenated
5D channels) is absorbed into the consuming conv kernels at
parameter-pack time (ops/zpack.py ``seg_perm``), so the hot path has NO
interleaving reshapes.  (The first packed attempt interleaved z-groups at
runtime — ``group_concat`` strided scatters — and measured SLOWER than 5D,
0.0889 vs 0.0946 tiles/s; this layout removes exactly that cost.)

Equivalence: a trained 5D model's params convert EXACTLY via
:func:`pack_unet_params` (3D kernels become block-structured, row-permuted
2D kernels) — outputs match the 5D model up to float reassociation
(golden-tested).  Attention blocks and the RNA tower run unchanged in 5D
(resolution-16 tensors are small; the pack/unpack there is two cheap
reshapes), so their param subtrees are shared verbatim.

Training: ``PackedTeraUNet(conf, from_5d=True)`` declares parameters in
TeraUNet's exact shapes and builds the packed kernels inside the forward
(:class:`Conv3DAsPacked`), so training at packed speed optimizes exactly
the reference weight class — fresh inits and checkpoints are bit-
interchangeable with TeraUNet (tested in tests/test_packed.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.collage import to_collage
from ..ops.zpack import (pack_conv3d_bias, pack_conv3d_kernel,
                         pack_conv3d_kernel_jnp, pack_channel_param,
                         pack_features, packed_to_pixel, pixel_to_packed,
                         unpack_features)
from .attention import DiTBlock
from .nn import TimeEmbed, timestep_embedding
from .rna import RNATower, rna_grid_from_dense
from .unet import TeraUNetConfig, _rna_channels

import jax


class GroupedRMSNorm(nn.Module):
    """RMSNorm over each z-plane's channels of a packed (.., Z*C) tensor.

    The 5D norm takes RMS over ALL channels at each (z, h, w) position
    (nn.RMSNorm / reference MBAblocks.py:21-43); here those channels may be
    spread across plainly-concatenated segments (each z-major internally),
    so the statistics sum per segment and the normalization is applied
    slice-wise.  Param shape (Z*Ctot,) in the RUNTIME (segment-major)
    layout — the converter permutes accordingly."""

    z: int
    segments: Optional[Tuple[int, ...]] = None
    eps: float = 1e-6
    from_5d: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        zc = x.shape[-1]
        z = self.z
        segs = self.segments or (zc // z,)
        ctot = int(sum(segs))
        assert z * ctot == zc, (segs, z, zc)
        # from_5d: the parameter keeps the 5D model's (C,) shape so
        # checkpoints/inits are interchangeable with TeraUNet
        weight = self.param("weight", nn.initializers.ones,
                            (ctot,) if self.from_5d else (zc,))
        w = weight.astype(x.dtype)

        # Per-z statistics via CONSTANT channel masks: full-width fusable
        # reductions and one fused elementwise output — no (Z,C) reshape
        # (lane->sublane relayout) and no concat of lane slices (both
        # measured as the top cost of earlier packed attempts).
        zidx = np.concatenate([np.repeat(np.arange(z), cs)
                               for cs in segs])        # z of each channel
        x2 = jnp.square(x.astype(jnp.float32))
        inv = []
        for zi in range(z):
            m = jnp.asarray(zidx == zi, jnp.float32)
            s = jnp.sum(x2 * m, axis=-1, keepdims=True)
            inv.append(jax.lax.rsqrt(s / ctot + self.eps).astype(x.dtype))

        # per-5D-channel weight, expanded to the packed layout statically
        if self.from_5d:
            coff = np.concatenate([np.tile(np.arange(cs) + off, z)
                                   for off, cs in zip(
                                       np.cumsum([0] + list(segs))[:-1],
                                       segs)])
            w = w[coff]
        sc = inv[0] * jnp.asarray(zidx == 0, x.dtype)
        for zi in range(1, z):
            sc = sc + inv[zi] * jnp.asarray(zidx == zi, x.dtype)
        return (x * sc * w).astype(x.dtype)


def _up2(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _down2(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def conv2p(features, kernel=(3, 3), *, zero_init=False, dtype=None,
           quant=None, prequant=False, static_act=False, name=None):
    pad = [((k - 1) // 2,) * 2 for k in kernel]
    init = nn.initializers.zeros if zero_init \
        else nn.initializers.lecun_normal()
    if quant == "int8":
        return QuantConv2p(features=features, kernel_size=tuple(kernel),
                           kernel_init=init, dtype=dtype,
                           prequant=prequant, static_act=static_act,
                           name=name)
    return nn.Conv(features, kernel_size=tuple(kernel), padding=pad,
                   use_bias=True, kernel_init=init, dtype=dtype, name=name)


class QuantConv2p(nn.Module):
    """Drop-in int8 replacement for conv2p's nn.Conv: identical param
    shapes/names ("kernel" (kh,kw,ci,co), "bias" (co,)), so packed param
    trees load unchanged; execution runs the dynamic-int8 MXU path
    (ops/quant.py).  Inference-only — no custom VJP."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    kernel_init: nn.initializers.Initializer = \
        nn.initializers.lecun_normal()
    dtype: Optional[jnp.dtype] = None
    prequant: bool = False   # params hold kernel_q/w_scale instead of
                             # kernel (ops.quant.prequantize_params) —
                             # skips per-call weight quantization
    static_act: bool = False  # params hold a calibrated per-tensor
                              # a_scale (ops.quant.bake_act_scales) — the
                              # activation quantize fuses into its
                              # producer instead of a dynamic abs-max

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.quant import quant_conv2d
        kh, kw = self.kernel_size
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        pad = [((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2]
        a = None
        if self.static_act:
            a = self.param("a_scale",
                           lambda k, s: jnp.ones(s, jnp.float32), ())
        elif not self.is_initializing():
            # observed activation abs-max, for calibration runs (no-op
            # unless apply(..., mutable=['calib']); gated out of init so
            # init trees stay identical to the exact model's)
            self.sow("calib", "a_max",
                     jnp.max(jnp.abs(x)).astype(jnp.float32))
        if self.prequant:
            wq = self.param("kernel_q",
                            lambda k, s: jnp.zeros(s, jnp.int8),
                            (kh, kw, x.shape[-1], self.features))
            sw = self.param("w_scale",
                            lambda k, s: jnp.ones(s, jnp.float32),
                            (self.features,))
            return quant_conv2d(x, None, b, pad,
                                out_dtype=self.dtype or x.dtype,
                                w_q=wq, w_scale=sw, a_scale=a)
        w = self.param("kernel", self.kernel_init,
                       (kh, kw, x.shape[-1], self.features))
        return quant_conv2d(x, w, b, pad,
                            out_dtype=self.dtype or x.dtype, a_scale=a)


class Conv3DAsPacked(nn.Module):
    """Packed 2D conv whose PARAMETER is the reference-shaped 3D kernel.

    Params match TeraUNet's conv3d exactly ("kernel" (kz,ky,kx,ci,co),
    "bias" (co,)), so 5D checkpoints load directly and fresh inits are
    bit-identical (same shapes, names, rng paths).  The packed kernel is
    rebuilt per call via :func:`pack_conv3d_kernel_jnp` — a few concats +
    a static gather on kernel-sized tensors, noise next to the conv.
    This is what makes TRAINING in the packed layout optimize exactly the
    reference weight class."""

    features: int                 # per-z output channels
    z: int
    kernel3: Tuple[int, int, int] = (3, 3, 3)
    segments: Optional[Tuple[int, ...]] = None
    zero_init: bool = False
    dtype: Optional[jnp.dtype] = None
    quant: Optional[str] = None   # 'int8' -> dynamic-quant MXU path

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        z = self.z
        ci = x.shape[-1] // z
        kz, ky, kx = self.kernel3
        init = nn.initializers.zeros if self.zero_init \
            else nn.initializers.lecun_normal()
        w3 = self.param("kernel", init, (kz, ky, kx, ci, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or x.dtype
        pad = [((ky - 1) // 2,) * 2, ((kx - 1) // 2,) * 2]
        if self.quant == "int8":
            from ..ops.quant import quant_conv2d
            w2 = pack_conv3d_kernel_jnp(w3.astype(jnp.float32), z,
                                        self.segments)
            return quant_conv2d(x, w2, jnp.tile(b, z), pad, out_dtype=dt)
        w2 = pack_conv3d_kernel_jnp(w3.astype(dt), z, self.segments)
        y = jax.lax.conv_general_dilated(
            x.astype(dt), w2, (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + jnp.tile(b.astype(dt), z)


class PackedResBlock(nn.Module):
    """ResBlock3D on the packed layout; param names match ResBlock3D.

    ``in_segments``: per-z channel counts of the plainly-concatenated
    z-major segments forming the input (skip/rna concats); the in_norm
    statistics and the converted in_/skip_conv kernels account for it."""

    out_channels: int          # per-z channels C (NOT Z*C)
    z: int
    in_segments: Optional[Tuple[int, ...]] = None
    dropout: float = 0.0
    up: bool = False
    down: bool = False
    use_zero_module: bool = True
    compute_dtype: jnp.dtype = jnp.float32
    from_5d: bool = False      # params in TeraUNet's (3D/5D) shapes
    quant: Optional[str] = None  # 'int8' on the resblock convs
    prequant: bool = False     # int8 kernels pre-quantized in the params
    static_act: bool = False   # calibrated activation scales in params

    def _conv(self, features, kernel3, *, zero_init=False, segments=None,
              name=None):
        if self.from_5d:
            return Conv3DAsPacked(features=features, z=self.z,
                                  kernel3=kernel3, segments=segments,
                                  zero_init=zero_init, quant=self.quant,
                                  dtype=self.compute_dtype, name=name)
        return conv2p(self.z * features, kernel3[1:], zero_init=zero_init,
                      quant=self.quant, prequant=self.prequant,
                      static_act=self.static_act,
                      dtype=self.compute_dtype, name=name)

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True) -> jnp.ndarray:
        dt = self.compute_dtype
        z = self.z
        in_zc = x.shape[-1]
        out_zc = z * self.out_channels

        h = GroupedRMSNorm(z=z, segments=self.in_segments,
                           from_5d=self.from_5d,
                           name="in_norm")(x.astype(dt))
        h = nn.silu(h)
        if self.up:
            h, x = _up2(h), _up2(x)
        elif self.down:
            h, x = _down2(h), _down2(x)
        h = self._conv(self.out_channels, (3, 3, 3),
                       segments=self.in_segments, name="in_conv")(h)

        h = GroupedRMSNorm(z=z, from_5d=self.from_5d, name="out_norm")(h)
        if emb is not None:
            emb_out = nn.Dense(2 * self.out_channels, dtype=dt,
                               name="emb_proj")(
                nn.silu(emb.astype(dt))).astype(h.dtype)
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            # per-C scale/shift broadcast over z (tile z-major)
            scale = jnp.tile(scale, (1, z))[:, None, None, :]
            shift = jnp.tile(shift, (1, z))[:, None, None, :]
            h = h * (1.0 + scale) + shift
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = self._conv(self.out_channels, (3, 3, 3),
                       zero_init=self.use_zero_module, name="out_conv")(h)

        if in_zc != out_zc:
            x = self._conv(self.out_channels, (1, 1, 1),
                           segments=self.in_segments, name="skip_conv")(x)
        return (x + h).astype(dt)


def _collage4(x: jnp.ndarray, p1: int, p2: int) -> jnp.ndarray:
    """to_collage on packed 4D tensors (insert a dummy z axis)."""
    return to_collage(x[:, None], p1, p2)[:, 0]


class PackedTeraUNet(nn.Module):
    """See module docstring; API identical to TeraUNet.

    from_5d=True declares parameters in TeraUNet's exact shapes (3D conv
    kernels, per-C norm weights) and transforms them to the packed layout
    inside the forward — fresh inits and checkpoints are then bit-
    interchangeable with TeraUNet, which makes this the TRAINING-speed
    path.  from_5d=False expects pre-transformed params
    (:func:`pack_unet_params`), skipping the per-call kernel build."""

    conf: TeraUNetConfig
    from_5d: bool = False
    quant: Optional[str] = None   # 'int8': dynamic-quant resblock convs
                                  # (stem/out_conv stay high-precision —
                                  # they touch raw pixels); inference-only
    prequant: bool = False        # with quant: params carry int8 kernels
                                  # (ops.quant.prequantize_params) so the
                                  # z-window loop skips weight re-quant
    static_act: bool = False      # with quant: params carry calibrated
                                  # activation scales (bake_act_scales) —
                                  # no dynamic abs-max pass
    quant_attn: bool = False      # with quant: ALSO run the DiT blocks'
                                  # dense projections (adaLN, q/k/v/proj,
                                  # MLP) as int8 — the largest non-conv
                                  # matmul share; logits/value products
                                  # and norms stay bf16
    packed_attn: bool = False     # run the DiT blocks directly on the
                                  # packed (h, w, z)-token layout — drops
                                  # the per-block 5D pack/unpack
                                  # transposes (attention is permutation-
                                  # equivariant over tokens; outputs equal
                                  # up to float reassociation).  Same
                                  # params either way

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, rna: jnp.ndarray,
                 p1: int, p2: int, *, deterministic: bool = True,
                 decode_original: bool = True,
                 pos_emb: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        conf = self.conf
        dt = conf.dtype
        z = conf.z_size
        z_rna = len(conf.rna_tpl)
        nrb = conf.num_res_blocks
        nlvl = len(conf.channel_mult)
        rna_och = _rna_channels(conf.rna_num)

        t_emb = timestep_embedding(t, conf.model_channels)
        emb_b = TimeEmbed(conf.embed_channels, use_pos=conf.use_pos,
                          name="time_embed")(t_emb, pos_emb)
        emb_orig = jnp.repeat(emb_b, p1 * p2, axis=0)
        emb_col = jnp.repeat(emb_b, (p1 - 1) * (p2 - 1), axis=0)

        rna_grid = rna_grid_from_dense(rna.astype(dt), z_rna, conf.rna_num)
        rna_feats5, rna_pres5, _ = RNATower(rna_num=conf.rna_num,
                                            z_rna=z_rna,
                                            gn_sz=conf.gn_sz, dtype=dt,
                                            name="rna_tower")(rna_grid)
        rna_feats = [pack_features(f, z) for f in rna_feats5]
        rna_pres = [pack_features(f, z) for f in rna_pres5]

        bp, ps, _, _ = x.shape
        h = pixel_to_packed(x.astype(dt), z)

        def attn(block: DiTBlock, hp, condp, cond5):
            """condp/cond5: the packed and 5D views of the same rna cond
            (both already computed; the unused one is DCE'd)."""
            if self.packed_attn:
                return block(hp, condp, z_size=z)
            h5 = unpack_features(hp, z)
            return pack_features(block(h5, cond5), z)

        qa = self.quant if (self.quant_attn and self.quant) else None

        def dit(hidden_size, name):
            return DiTBlock(hidden_size=hidden_size,
                            num_heads=conf.num_heads, n_win=2, dtype=dt,
                            quant=qa, prequant=qa is not None and
                            self.prequant, static_act=qa is not None and
                            self.static_act,
                            packed_tokens=self.packed_attn, name=name)

        if self.from_5d:
            h = Conv3DAsPacked(features=conf.model_channels, z=z,
                               kernel3=(1, 3, 3), dtype=dt,
                               name="stem")(h)
        else:
            h = conv2p(z * conf.model_channels, (3, 3), dtype=dt,
                       name="stem")(h)
        hid: List[List[jnp.ndarray]] = [[h]]
        resolution = conf.image_size
        k = 1
        for lvl, mult in enumerate(conf.channel_mult):
            if lvl > 0:
                h = PackedResBlock(from_5d=self.from_5d, quant=self.quant, prequant=self.prequant, static_act=self.static_act, out_channels=h.shape[-1] // z, z=z,
                                   down=True, dropout=conf.dropout,
                                   use_zero_module=conf.use_zero_module,
                                   compute_dtype=dt, name=f"enc_{k}_res")(
                                       h, emb_orig,
                                       deterministic=deterministic)
                resolution //= 2
                k += 1
                hid.append([h])
            rfeat = rna_feats[nlvl - 1 - lvl]
            rfeat5 = rna_feats5[nlvl - 1 - lvl]
            for _ in range(nrb):
                segs = (h.shape[-1] // z, rfeat.shape[-1] // z)
                h = jnp.concatenate([h, rfeat], axis=-1)
                h = PackedResBlock(from_5d=self.from_5d, quant=self.quant, prequant=self.prequant, static_act=self.static_act, out_channels=mult * conf.model_channels,
                                   z=z, in_segments=segs,
                                   dropout=conf.dropout,
                                   compute_dtype=dt,
                                   use_zero_module=conf.use_zero_module,
                                   name=f"enc_{k}_res")(
                                       h, emb_orig,
                                       deterministic=deterministic)
                if resolution in conf.attention_resolutions:
                    h = attn(dit(h.shape[-1] // z, f"enc_{k}_attn"),
                             h, rfeat, rfeat5)
                hid[lvl].append(h)
                k += 1

        segs = (h.shape[-1] // z, rna_feats[0].shape[-1] // z)
        h = jnp.concatenate([h, rna_feats[0]], axis=-1)
        h = PackedResBlock(from_5d=self.from_5d, quant=self.quant, prequant=self.prequant, static_act=self.static_act, out_channels=h.shape[-1] // z - rna_och[0], z=z,
                           in_segments=segs,
                           dropout=conf.dropout, compute_dtype=dt,
                           use_zero_module=conf.use_zero_module,
                           name="mid_res0")(h, emb_orig,
                                            deterministic=deterministic)
        h = attn(dit(h.shape[-1] // z, "mid_attn"), h, rna_feats[0],
                 rna_feats5[0])
        h = PackedResBlock(from_5d=self.from_5d, quant=self.quant, prequant=self.prequant, static_act=self.static_act, out_channels=h.shape[-1] // z, z=z,
                           dropout=conf.dropout,
                           use_zero_module=conf.use_zero_module,
                           compute_dtype=dt, name="mid_res1")(
                               h, emb_orig, deterministic=deterministic)

        dec_res, dec_attn, dec_up = [], [], []
        res = resolution
        k = 0
        dch = h.shape[-1] // z
        skips_ch = [[s.shape[-1] // z for s in level] for level in hid]
        for i in range(nlvl):
            lvl = nlvl - 1 - i
            mult = conf.channel_mult[lvl]
            for j in range(nrb + 1):
                sk_ch = skips_ch[lvl].pop()
                dec_res.append(PackedResBlock(from_5d=self.from_5d, quant=self.quant, prequant=self.prequant, static_act=self.static_act, 
                    out_channels=mult * conf.model_channels, z=z,
                    in_segments=(dch, sk_ch, rna_och[i]),
                    dropout=conf.dropout, compute_dtype=dt,
                    use_zero_module=conf.use_zero_module,
                    name=f"dec_{k}_res"))
                dch = mult * conf.model_channels
                dec_attn.append(
                    dit(mult * conf.model_channels, f"dec_{k}_attn")
                    if res in conf.attention_resolutions else None)
                if lvl > 0 and j == nrb:
                    dec_up.append(PackedResBlock(from_5d=self.from_5d, quant=self.quant, prequant=self.prequant, static_act=self.static_act, 
                        out_channels=mult * conf.model_channels, z=z,
                        up=True, dropout=conf.dropout, compute_dtype=dt,
                        use_zero_module=conf.use_zero_module,
                        name=f"dec_{k}_up"))
                    res *= 2
                else:
                    dec_up.append(None)
                k += 1
        out_norm = GroupedRMSNorm(z=z, from_5d=self.from_5d,
                                  name="out_norm")
        if self.from_5d:
            out_conv = Conv3DAsPacked(features=conf.stains, z=z,
                                      kernel3=(1, 3, 3), dtype=dt,
                                      name="out_conv")
        else:
            out_conv = conv2p(z * conf.stains, (3, 3), dtype=dt,
                              name="out_conv")

        preds = []
        for o in range(2 if decode_original else 1):
            hdec = h
            emb = emb_col if o == 0 else emb_orig
            skips = [list(level) for level in hid]
            rna5_dec = rna_feats5
            k = 0
            for i in range(nlvl):
                lvl = nlvl - 1 - i
                rcnd = rna_feats[i]
                rcnd5 = rna5_dec[i]
                if o == 0:
                    if i == 0:
                        hdec = _collage4(hdec, p1, p2)
                    # collage the pre-upsample stage: 4x fewer elements,
                    # exactly equal (rna.py docstring)
                    rcnd = _up2(_collage4(rna_pres[i], p1, p2))
                    rcnd5 = to_collage(rcnd5, p1, p2)
                for j in range(nrb + 1):
                    hcnd = skips[lvl].pop()
                    if o == 0:
                        hcnd = _collage4(hcnd, p1, p2)
                    hdec = jnp.concatenate([hdec, hcnd, rcnd], axis=-1)
                    hdec = dec_res[k](hdec, emb,
                                      deterministic=deterministic)
                    if dec_attn[k] is not None:
                        hdec = attn(dec_attn[k], hdec, rcnd, rcnd5)
                    if dec_up[k] is not None:
                        hdec = dec_up[k](hdec, emb,
                                         deterministic=deterministic)
                    k += 1

            out = out_norm(hdec)
            out = nn.silu(out)
            out = out_conv(out)
            out = packed_to_pixel(out, z).astype(jnp.float32)
            preds.append(out)

        return preds[0], (preds[1] if decode_original else None)


# --------------------------------------------------------------------- #
# 5D -> packed parameter transform                                       #
# --------------------------------------------------------------------- #
def _block_segments(conf: TeraUNetConfig) -> Dict[str, Tuple[int, ...]]:
    """Per-block INPUT segment structure (per-z channel counts), mirroring
    the forward's plain-concat sites.  Blocks absent from the map have
    single-segment inputs."""
    mc = conf.model_channels
    nrb = conf.num_res_blocks
    nlvl = len(conf.channel_mult)
    rna_och = _rna_channels(conf.rna_num)
    segs: Dict[str, Tuple[int, ...]] = {}
    ch = mc
    hid_ch: List[List[int]] = [[mc]]
    k = 1
    for lvl, mult in enumerate(conf.channel_mult):
        if lvl > 0:
            k += 1
            hid_ch.append([ch])
        rch = rna_och[nlvl - 1 - lvl]
        for _ in range(nrb):
            segs[f"enc_{k}_res"] = (ch, rch)
            ch = mult * mc
            hid_ch[lvl].append(ch)
            k += 1
    segs["mid_res0"] = (ch, rna_och[0])
    dch = ch
    k = 0
    skips = [list(level) for level in hid_ch]
    for i in range(nlvl):
        lvl = nlvl - 1 - i
        mult = conf.channel_mult[lvl]
        for _ in range(nrb + 1):
            sk = skips[lvl].pop()
            segs[f"dec_{k}_res"] = (dch, sk, rna_och[i])
            dch = mult * mc
            k += 1
    return segs


def pack_unet_params(params5: Dict, conf: TeraUNetConfig) -> Dict:
    """Transform a TeraUNet param tree into PackedTeraUNet's.

    Conv3d kernels become block-structured 2D kernels with input rows
    permuted to the segment-major runtime layout; norm weights tile over z
    (segment-aware for concat inputs); attention / RNA tower / time-embed
    subtrees pass through."""
    z = conf.z_size
    segmap = _block_segments(conf)
    p5 = params5["params"] if "params" in params5 else params5
    out: Dict = {}
    for name, sub in p5.items():
        if name.endswith("_res") or name in ("mid_res0", "mid_res1") \
                or name.endswith("_up"):
            segs = segmap.get(name)
            blk = {}
            for lname, lv in sub.items():
                if lname in ("in_conv", "out_conv", "skip_conv"):
                    in_segs = segs if lname in ("in_conv",
                                                "skip_conv") else None
                    blk[lname] = {
                        "kernel": pack_conv3d_kernel(
                            np.asarray(lv["kernel"]), z, segments=in_segs),
                        "bias": pack_conv3d_bias(lv["bias"], z)}
                elif lname in ("in_norm", "out_norm"):
                    in_segs = segs if lname == "in_norm" else None
                    blk[lname] = {"weight": pack_channel_param(
                        lv["weight"], z, segments=in_segs)}
                else:
                    blk[lname] = lv
            out[name] = blk
        elif name in ("stem", "out_conv"):
            out[name] = {"kernel": pack_conv3d_kernel(
                np.asarray(sub["kernel"]), z),
                "bias": pack_conv3d_bias(sub["bias"], z)}
        elif name == "out_norm":
            out[name] = {"weight": pack_channel_param(sub["weight"], z)}
        else:
            out[name] = sub
    return {"params": out}
