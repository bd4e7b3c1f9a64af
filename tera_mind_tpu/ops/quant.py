"""Dynamic int8 quantized convolution for TPU inference.

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 peak (394 TOPS vs
197 TFLOPS), and the packed TeraUNet's convolutions are 76.5% of a
generation step at ~100% bf16 MXU utilization (BASELINE.md) — int8 is the
one arithmetic change left that can beat the bf16 FLOP floor on a single
chip.  Microbenchmark evidence: scripts/bench_int8.py (chained-conv
protocol) observes int8 conv throughput above the bf16 peak on the
model's hot shapes.

Scheme (inference-only, opt-in via ``PackedTeraUNet(conf, quant='int8')``):

- **Weights**: symmetric per-output-channel int8, scales from the
  (small) kernel tensor at apply time — params stay in the exact
  reference weight class (f32/bf16), so checkpoints/conversion are
  untouched and quantization is a pure execution-mode choice.
- **Activations**: dynamic symmetric per-tensor int8 (abs-max / 127,
  one reduction — comparable to a norm pass, amortized against a 2x
  conv).  Zero maps to zero, so SAME zero-padding is exact.
- Accumulation in int32, dequantize to f32 with ``s_x * s_w[co]``, add
  bias, cast to the compute dtype.

This is a TPU-side extension (no reference parity to preserve — the
reference has no quantized path); quality is gated by
tests/test_quant.py which bounds the int8-vs-bf16 output error of the
packed model.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

_EPS = 1e-8


def quantize_tensor(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-tensor int8: returns (x_q, scale)."""
    s = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0, _EPS)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 for an HWIO kernel:
    returns (w_q, scales (co,))."""
    s = jnp.maximum(
        jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
        .astype(jnp.float32) / 127.0, _EPS)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def quant_conv2d(x: jnp.ndarray, w: Optional[jnp.ndarray],
                 bias: Optional[jnp.ndarray],
                 padding: Sequence[Tuple[int, int]],
                 out_dtype=jnp.bfloat16,
                 w_q: Optional[jnp.ndarray] = None,
                 w_scale: Optional[jnp.ndarray] = None,
                 a_scale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """int8 NHWC conv with dynamic activation + per-channel weight quant.

    ``x`` (N,H,W,Ci) any float dtype; ``w`` (kh,kw,Ci,Co); ``bias`` is
    added AFTER dequantization (full precision, possibly pre-tiled by the
    caller).  Returns (N,H,W,Co) in ``out_dtype``.

    Pass pre-quantized weights via ``w_q``/``w_scale`` (see
    :func:`prequantize_params`) to skip the per-call weight quantization —
    inside the generator's z-window loop the dynamic path re-quantizes
    every kernel once per window (25x per step), which profiling showed
    costs ~15% of the int8 step.

    Pass a CALIBRATED per-tensor ``a_scale`` (see
    :func:`make_calibrating_model_fn` / :func:`bake_act_scales`) to skip
    the dynamic abs-max too: the scale+round+cast then fuses into the
    activation's producer (norm/SiLU) instead of re-reading the whole
    tensor — activation quantization becomes bandwidth-free.  Values
    beyond the calibrated range saturate at +-127.
    """
    if a_scale is not None:
        sx = a_scale.astype(jnp.float32)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
    else:
        xq, sx = quantize_tensor(x)
    if w_q is not None:
        wq, sw = w_q, w_scale
    else:
        wq, sw = quantize_weight(w)
    y = lax.conv_general_dilated(
        xq, wq, (1, 1), list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def quant_dense(x: jnp.ndarray, w: Optional[jnp.ndarray],
                bias: Optional[jnp.ndarray],
                out_dtype=jnp.bfloat16,
                w_q: Optional[jnp.ndarray] = None,
                w_scale: Optional[jnp.ndarray] = None,
                a_scale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """int8 dense: ``x (..., Ci) @ w (Ci, Co)`` on the MXU.

    Same scheme as :func:`quant_conv2d` (symmetric per-tensor activations,
    per-output-channel weights, int32 accumulation) — used for the DiT
    blocks' projection/MLP matmuls, which are the largest non-conv share
    of an int8 generation step (BASELINE.md int8 profile)."""
    if a_scale is not None:
        sx = a_scale.astype(jnp.float32)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
    else:
        xq, sx = quantize_tensor(x)
    if w_q is not None:
        wq, sw = w_q, w_scale
    else:
        wq, sw = quantize_weight(w)
    y = lax.dot_general(xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


class QuantDense(nn.Module):
    """Drop-in int8 replacement for ``nn.Dense`` (param names/shapes
    identical: "kernel" (Ci, Co), "bias" (Co,)), mirroring
    :class:`~tera_mind_tpu.models.unet_packed.QuantConv2p`'s
    prequant / static_act / calibration-sow contract.  Inference-only."""

    features: int
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32
    prequant: bool = False
    static_act: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype)
        a = None
        if self.static_act:
            a = self.param("a_scale",
                           lambda k, s: jnp.ones(s, jnp.float32), ())
        elif not self.is_initializing():
            self.sow("calib", "a_max",
                     jnp.max(jnp.abs(x)).astype(jnp.float32))
        if self.prequant:
            wq = self.param("kernel_q",
                            lambda k, s: jnp.zeros(s, jnp.int8),
                            (x.shape[-1], self.features))
            sw = self.param("w_scale",
                            lambda k, s: jnp.ones(s, jnp.float32),
                            (self.features,))
            return quant_dense(x, None, b, out_dtype=self.dtype or x.dtype,
                               w_q=wq, w_scale=sw, a_scale=a)
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (x.shape[-1], self.features), self.param_dtype)
        return quant_dense(x, w, b, out_dtype=self.dtype or x.dtype,
                           a_scale=a)


_RESBLOCK = re.compile(
    r"^(enc_\d+_res|dec_\d+_res|dec_\d+_up|mid_res[01])$")
_QCONVS = ("in_conv", "out_conv", "skip_conv")
_ATTNBLOCK = re.compile(r"^(enc_\d+_attn|dec_\d+_attn|mid_attn)$")
_QDENSES = ("adaLN", "q", "k", "v", "proj", "fc1", "fc2")


def prequantize_params(params, attn: bool = False):
    """Pre-quantize a PACKED param tree (from_5d=False layout) for
    ``PackedTeraUNet(conf, quant='int8', prequant=True)``.

    For every resblock conv (``{enc,dec,mid}*_{res,up}/{in,out,skip}_conv``
    — exactly the set the quant flag routes through QuantConv2p) the float
    ``kernel`` is replaced by ``kernel_q`` (int8) + ``w_scale`` (f32 per
    output channel), computed with the same :func:`quantize_weight` the
    dynamic path uses, so outputs are bit-identical to dynamic weight
    quantization.  Bias and every non-resblock param pass through
    untouched.  The UNet-level ``stem``/``out_conv`` (root) are NOT
    quantized — their parent is the root, not a resblock.

    With ``attn=True`` (for ``PackedTeraUNet(..., quant_attn=True)``) the
    DiT blocks' dense kernels (adaLN, attention q/k/v/proj, MLP fc1/fc2 —
    the set routed through :class:`QuantDense`) are pre-quantized the same
    way; the attention logits/value matmuls and all norms stay bf16.
    """
    col = params["params"] if "params" in params else params

    def quantized(sub):
        wq, sw = quantize_weight(jnp.asarray(sub["kernel"], jnp.float32))
        new = {k: v for k, v in sub.items() if k != "kernel"}
        new["kernel_q"], new["w_scale"] = wq, sw
        return new

    def walk(tree, parent, in_attn):
        out = {}
        for name, sub in tree.items():
            if (isinstance(sub, dict) and name in _QCONVS
                    and _RESBLOCK.match(parent or "")
                    and "kernel" in sub and sub["kernel"].ndim == 4):
                out[name] = quantized(sub)
            elif (attn and in_attn and isinstance(sub, dict)
                    and name in _QDENSES and "kernel" in sub
                    and sub["kernel"].ndim == 2):
                out[name] = quantized(sub)
            elif isinstance(sub, dict):
                out[name] = walk(sub, name,
                                 in_attn or bool(_ATTNBLOCK.match(name)))
            else:
                out[name] = sub
        return out

    new_col = walk(col, None, False)
    if "params" in params:
        return {**params, "params": new_col}
    return new_col


def _path_names(path) -> Tuple:
    """jax key-path -> tuple of dict-key strings (drops sequence idxs)."""
    return tuple(e.key for e in path if hasattr(e, "key"))


def to_inference_dtype(params, dtype=jnp.bfloat16):
    """Cast float params to the inference compute dtype while preserving
    the quantization leaves exactly: int8 ``kernel_q`` (non-float),
    f32 ``w_scale`` and ``a_scale`` (the static path's bit-exactness
    depends on f32 scale arithmetic).  Safe on non-quantized trees."""
    import jax

    def cast(kp, p):
        name = getattr(kp[-1], "key", None)
        p = jnp.asarray(p)
        if name in ("w_scale", "a_scale") or \
                not jnp.issubdtype(p.dtype, jnp.floating):
            return p
        return p.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params)


def make_calibrating_model_fn(model, accum: dict):
    """Wrap a dynamic-quant ``PackedTeraUNet(quant='int8')`` into a
    TeraGenerator-compatible ``model_fn(params, x, t, rna, p1, p2)`` that
    streams every QuantConv's observed activation abs-max to the host
    (``jax.experimental.io_callback`` — works inside the generator's
    ``lax.scan``/``jit`` loops) and max-accumulates it into ``accum``
    (module-path tuple -> float).  Run any representative generation
    chain with it, then :func:`bake_act_scales`.

    NOTE: requires a backend with host-callback support (CPU, stock
    libtpu).  The axon PJRT plugin rejects io_callback — use
    :func:`calibrate_generator` there (callback-free, amaxes returned as
    jit outputs).
    """
    import numpy as np
    import jax
    from jax.experimental import io_callback

    keys_box: list = []

    def host_accum(vals):
        for k, v in zip(keys_box[0], np.asarray(vals)):
            accum[k] = max(accum.get(k, 0.0), float(v))

    def model_fn(p, xp, tm, rp, p1, p2):
        out, cal = model.apply(p, xp, tm, rp, p1, p2,
                               decode_original=False, mutable=["calib"])
        flat = jax.tree_util.tree_leaves_with_path(cal)
        if not keys_box:
            keys_box.append([_path_names(k) for k, _ in flat])
        io_callback(host_accum, None,
                    jnp.stack([v.astype(jnp.float32) for _, v in flat]),
                    ordered=False)
        return out

    return model_fn


def bake_act_scales(params, accum: dict, margin: float = 1.0):
    """Insert calibrated ``a_scale`` params (amax/127 * margin) into a
    (pre-quantized) param tree, for ``PackedTeraUNet(...,
    static_act=True)``.  ``accum`` is the dict filled by
    :func:`make_calibrating_model_fn`: keys are module-path tuples ending
    in ('calib', ..., 'a_max')."""
    col = dict(params["params"]) if "params" in params else dict(params)

    import numpy as np

    def scale_of(val):
        # f32 arithmetic in the dynamic path's exact order
        # (quantize_tensor: max(amax/127, eps)), so a static scale
        # calibrated on an input reproduces the dynamic result bit-exactly
        s = np.float32(val) / np.float32(127.0)
        s = np.maximum(s, np.float32(_EPS))
        if margin != 1.0:
            s = s * np.float32(margin)
        return jnp.asarray(s, jnp.float32)

    def insert(tree, path, val):
        tree = dict(tree)
        if len(path) == 1:
            tree["a_scale"] = scale_of(val)
        else:
            tree[path[0]] = insert(tree[path[0]], path[1:], val)
        return tree

    for key, amax in accum.items():
        assert key[0] == "calib" and key[-1] == "a_max", key
        col = insert(col, key[1:], amax)

    if "params" in params:
        return {**params, "params": col}
    return col


def calibrate_generator(gen, model, params, gene_grid, *, steps,
                        state=None, row0: int = 1, col0: int = 1,
                        grid_w: int = 416, margin: float = 1.0):
    """Callback-free activation calibration for ``static_act`` int8.

    The axon PJRT plugin (the tunneled-TPU environment) does not support
    host callbacks, so instead of :func:`make_calibrating_model_fn` this
    runs the dynamic-int8 chain with the generator's NORMAL compiled step
    and, at every timestep, additionally evaluates an instrumented
    window-group function whose flax ``mutable=['calib']`` amaxes are
    captured at trace time (no ``lax`` loop around the model call) and
    returned as ordinary jit outputs.  Costs ~2x one chain — calibration
    is a one-time, small-grid affair.

    ``gen`` must be a single-process :class:`TeraGenerator` built with
    the DYNAMIC quant model (``quant='int8'``) and ``params``;
    ``model`` is that same dynamic model (used for the instrumented
    apply).  Returns ``params`` with baked ``a_scale`` entries
    (:func:`bake_act_scales`).
    """
    import jax
    import numpy as np

    from ..ops.collage import patchify
    from ..parallel.generator import assemble_bins
    from ..parallel.halo import pad_halo_single

    c = gen.conf
    rows, cols = gene_grid.shape[:2]
    if state is None:
        state = gen.init_state(rows, cols, row0=row0, col0=col0,
                               grid_w=grid_w)
    dev_state = jnp.asarray(state)
    dev_gene = jnp.asarray(np.asarray(gene_grid))
    step = gen.compile_step(rows, cols, block_major=True)

    # re-read the conf AFTER compile_step: window_chunk=-1 (AUTO) is
    # resolved by auto_plan inside it.  `c.window_chunk or c.n_win` on a
    # raw -1 used to produce a NEGATIVE range step -> an empty window
    # loop -> zero calibration records -> the static model later died
    # with missing a_scale params (found by the round-5 dress rehearsal
    # driving cli.generate --quant int8_static with the -1 default)
    c = gen.conf
    chunk = gen._wchunk()
    gn_per_patch = c.patch // c.gn_blk
    nb, hb = c.tile // c.gn_blk, c.pad // c.gn_blk

    @jax.jit
    def instrumented(p, xw, rp, t_b):
        box = []

        def mf(*a):
            out, cal = model.apply(p, *a, decode_original=False,
                                   mutable=["calib"])
            box.append(cal)
            return out

        gen.sampler.denoise_step(mf, xw, rp, t_b)
        amax = {}
        for cal in box:
            for k, v in jax.tree_util.tree_leaves_with_path(cal):
                key = _path_names(k)
                amax[key] = jnp.maximum(amax[key], v) if key in amax \
                    else jnp.asarray(v, jnp.float32)
        return amax

    @jax.jit
    def prep(st, gene):
        padded = pad_halo_single(st, c.pad, fill=-1.0)
        hp, wp = padded.shape[:2]
        x = padded.reshape(hp, wp, c.stains, c.n_win, c.zi)
        x = x.transpose(3, 0, 1, 2, 4).reshape(c.n_win, hp, wp,
                                               c.stains * c.zi)
        g = assemble_bins(gene, nb, hb)
        return x, g

    accum: dict = {}
    t_b = None
    for t in range(steps - 1, -1, -1):
        x, g = prep(dev_state, dev_gene)
        for w0 in range(0, c.n_win, chunk):
            rw = jnp.stack([g[:, :, (w0 + j) * c.zi:
                              (w0 + j) * c.zi + c.snum, :]
                            for j in range(chunk)]).astype(jnp.float32)
            rw = rw.reshape(chunk, g.shape[0], g.shape[1],
                            c.snum * g.shape[-1])
            rp = patchify(rw, gn_per_patch)
            t_b = jnp.full((chunk,), t, jnp.int32)
            amax = jax.device_get(instrumented(
                gen.params, x[w0:w0 + chunk], rp, t_b))
            for k, v in amax.items():
                accum[k] = max(accum.get(k, 0.0), float(v))
        dev_state = step(dev_state, dev_gene, jnp.int32(t))
    jax.block_until_ready(dev_state)
    assert accum, ("calibration recorded no activation amaxes — the "
                   "instrumented window loop never ran")
    return bake_act_scales(params, accum, margin=margin)
