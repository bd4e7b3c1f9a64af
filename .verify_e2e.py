"""End-to-end verification drive: real TeraUNet through the public
TeraGenerator pipeline on TPU, small geometry; plus checkpoint/resume probe."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from tera_mind_tpu.models.unet import TeraUNetConfig
from tera_mind_tpu.diffusion.sampler import DiffusionSampler, SamplerConfig
from tera_mind_tpu.diffusion.schedule import spaced_schedule
from tera_mind_tpu.parallel.generator import GeneratorConfig, TeraGenerator
from tera_mind_tpu.data.tilestore import StateCheckpoint

t0 = time.time()
def stamp(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)

# real (tiny) UNet: 32px patches, 4 rna slices, 2 stains, 16 genes
mconf = TeraUNetConfig(image_size=32, gn_sz=2, rna_num=16, rna_tpl=(0,1,2,3),
                       in_channels=4, out_channels=4, model_channels=8,
                       embed_channels=32, dropout=0.0)
model = mconf.make_model()
x0 = jnp.zeros((4, 32, 32, 4)); r0 = jnp.zeros((4, 2, 2, 64))
params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32), r0, 2, 2)
stamp("model init done")

def model_fn(xp, tm, rp, p1, p2):
    return model.apply(params, xp, tm, rp, p1, p2)

gconf = GeneratorConfig(tile=128, patch=32, gn_blk=16, snum=4, n_slices=6,
                        stains=2, gdim=16, noise_backend="torch")
sched = spaced_schedule("linear", 1000, "ddim3")
sampler = DiffusionSampler(sched, SamplerConfig(patch_size=32, gn_sz=2))
gen = TeraGenerator(sampler, model_fn, gconf)

rng = np.random.default_rng(0)
gene = (rng.random((2, 2, gconf.gsz, gconf.gsz, gconf.z_pad, 16)) < 0.05
        ).astype(np.uint8) * 3
stamp(f"gene grid {gene.shape}, channels={gconf.channels}")

out = gen.run(gene, row0=1, col0=1, grid_w=416, progress=True)
stamp(f"generation done: out {out.shape} "
      f"range [{out.min():.3f},{out.max():.3f}] finite={np.isfinite(out).all()}")

# probe 1: determinism — same seeds -> same output
out2 = gen.run(gene, row0=1, col0=1, grid_w=416, progress=False)
stamp(f"determinism: max|diff|={np.abs(out-out2).max():.2e}")

# probe 2: checkpoint spill + resume mid-chain == uninterrupted run
ck = StateCheckpoint("/tmp/verify_ck/state", fmt="npy")
state0 = gen.init_state(2, 2, row0=1, col0=1, grid_w=416)
step = gen.compile_step(2, 2)
s = jnp.asarray(state0)
T = sched.num_timesteps
for t in range(T-1, 0, -1):   # run all but last step
    s = step(s, jnp.asarray(gene), jnp.int32(t))
grid = np.asarray(s).reshape(2, 128, 2, 128, gconf.channels).transpose(0,2,1,3,4)
ck.save_grid(T-1, grid, hst=128, wst=128, size=128)  # epochs done = T-1
out3 = gen.run(gene, row0=1, col0=1, grid_w=416, checkpoint=ck, progress=False)
stamp(f"resume-from-checkpoint: max|diff| vs full run = {np.abs(out-out3).max():.2e} (fp16 spill)")

# probe 3: 1x1 grid (different shape) also works
gene1 = gene[:1, :1]
out1 = gen.run(gene1, row0=1, col0=1, grid_w=416, progress=False)
stamp(f"1x1 grid ok: {out1.shape}, equals top-left tile of 2x2 interior? "
      f"(not expected equal: halo differs) maxdiff={np.abs(out1 - out[:128,:128]).max():.3f}")

# probe 4: block-major (the CLI default) must reproduce the tile path.
# gn_blk=16 > pad=16? need pad % gn_blk == 0: pad=16, gn_blk=16 -> hb=1 ok.
# NOTE: bench gene tiles here come from consistent field? For equality the
# per-tile overlap bins must agree — rebuild gene from one global field.
nb, hb = gconf.tile // gconf.gn_blk, gconf.pad // gconf.gn_blk
field = (rng.random((2 * nb + 2 * hb, 2 * nb + 2 * hb, gconf.z_pad, 16))
         < 0.05).astype(np.uint8) * 3
geneC = np.stack([np.stack([field[r*nb:r*nb+nb+2*hb, c*nb:c*nb+nb+2*hb]
                            for c in range(2)]) for r in range(2)])
t_probe = jnp.int32(1)
s0 = jnp.asarray(gen.init_state(2, 2, row0=1, col0=1, grid_w=416))
a = np.asarray(gen.compile_step(2, 2)(s0, jnp.asarray(geneC), t_probe))
b = np.asarray(gen.compile_step(2, 2, block_major=True)(
    s0, jnp.asarray(geneC), t_probe))
stamp(f"block-major == tile path: max|diff|={np.abs(a-b).max():.2e}")
# TPU convs reassociate across batch shapes and the DDIM 1/sqrt(abar) at
# small t amplifies that (~3.5e-4 observed); CPU equality is 1e-5
# (tests/test_generator.py::test_block_major_real_unet)
assert np.abs(a - b).max() < 5e-3, "block-major mismatch"
print("VERIFY_E2E_OK", flush=True)
