"""Flax InceptionV3 checks: architecture/converter shape tests, plus a
NUMERICS cross-check against a live randomly-initialized
``torchvision.models.inception_v3`` (the NVlabs torchscript export shares
torchvision's module layout, reference feat_mba.py:29-92; the weight FILES
are unavailable here, but the arithmetic — conv padding, BN eval semantics,
pooling — is proven equal against real torch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_inception_features_shape_and_params():
    from tera_mind_tpu.metrics.inception import InceptionV3Features

    model = InceptionV3Features()
    x = jnp.zeros((2, 299, 299, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda v, a: model.apply(v, a))(variables, x)
    assert out.shape == (2, 2048)
    n = sum(int(np.prod(p.shape))
            for p in jax.tree.leaves(variables["params"]))
    # torchvision InceptionV3 backbone (no fc/aux): ~21.8M params
    assert 21_000_000 < n < 23_000_000, n


def test_convert_torch_inception_mapping():
    """Converter maps conv/bn params+buffers onto the flax tree exactly."""
    from tera_mind_tpu.metrics.inception import (InceptionV3Features,
                                                 convert_torch_inception)

    model = InceptionV3Features()
    x = jnp.zeros((1, 299, 299, 3))
    ref = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    # synthesize a torch-style state matching the flax tree
    npar, nbuf = {}, {}

    def walk(tree, prefix):
        for k, v in tree.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, path)
            elif k == "kernel":
                npar[path.replace(".kernel", ".weight")] = \
                    np.transpose(np.asarray(v), (3, 2, 0, 1))
            elif k == "scale":
                npar[path.replace(".scale", ".weight")] = np.asarray(v)
            elif k == "bias":
                npar[path] = np.asarray(v)

    def walk_stats(tree, prefix):
        for k, v in tree.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk_stats(v, path)
            elif k == "mean":
                nbuf[path.replace(".mean", ".running_mean")] = np.asarray(v)
            elif k == "var":
                nbuf[path.replace(".var", ".running_var")] = np.asarray(v)

    walk(ref["params"], "")
    walk_stats(ref["batch_stats"], "")
    got = convert_torch_inception(npar, nbuf)
    for key, val in jax.tree_util.tree_flatten_with_path(ref)[0]:
        node = got
        for kk in key:
            node = node[kk.key]
        assert node.shape == val.shape, key


def test_inception_numerics_match_live_torch():
    """Forward parity vs live torch: a randomly-initialized torch replica of
    the torchvision/NVlabs InceptionV3 backbone (tests/inception_torch_replica
    — torchvision is not installed here), state converted with
    ``convert_torch_inception``, features through Mixed_7c + global avg pool
    compared.

    ``fid_variant=False`` selects torchvision pooling semantics
    (include-pad avg pools, avg pool in Mixed_7c); the NVlabs FID variant
    differs only in those pooling flags (metrics/inception.py), so this
    pins every conv/BN/concat path the FID extractor uses."""
    torch = pytest.importorskip("torch")

    from inception_torch_replica import build_torch_inception

    from tera_mind_tpu.metrics.inception import (InceptionV3Features,
                                                 convert_torch_inception)

    m = build_torch_inception(seed=0)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 299, 299, 3)).astype(np.float32)

    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    npar = {k: v.detach().numpy() for k, v in m.named_parameters()}
    nbuf = {k: v.detach().numpy() for k, v in m.named_buffers()
            if "num_batches_tracked" not in k}
    variables = convert_torch_inception(npar, nbuf)
    model = InceptionV3Features(fid_variant=False)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))

    assert got.shape == want.shape == (2, 2048)
    scale = float(np.abs(want).mean())
    mae = float(np.abs(got - want).mean())
    assert mae <= 1e-4 * max(scale, 1.0), (mae, scale)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-4)
