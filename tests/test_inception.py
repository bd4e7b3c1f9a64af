"""Flax InceptionV3 architecture checks (weights convert from the NVlabs
torchscript export when available; numerics golden-test needs that file)."""

import jax
import jax.numpy as jnp
import numpy as np


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
