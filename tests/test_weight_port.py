"""Weight-converter structural test: a synthetic reference-style torch
state dict must convert into exactly our Flax param tree (names + shapes),
so real reference checkpoints load 1:1."""

import sys
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))
import port_torch_weights as port  # noqa: E402

from srganfd_tpu.models import create_model  # noqa: E402


def _tree_spec(tree):
    flat = port.flatten(tree)
    return {k: tuple(v.shape) for k, v in flat.items()}


def _conv_entries(prefix, cin, cout, k=3, bias=True):
    rng = np.random.default_rng(0)
    d = {f"{prefix}.weight": rng.normal(size=(cout, cin, k, k)).astype(np.float32)}
    if bias:
        d[f"{prefix}.bias"] = np.zeros(cout, np.float32)
    return d


def test_rrdb_generator_converter_matches_flax_tree():
    ch, gc, nb = 8, 4, 2
    sd = {}
    sd.update(_conv_entries("conv1", 3, ch))
    for i in range(nb):
        for j in range(3):
            for k in range(5):
                cin = ch + gc * k
                cout = gc if k < 4 else ch
                sd.update(_conv_entries(f"trunk.{i}.rdb{j + 1}.conv{k + 1}", cin, cout))
    sd.update(_conv_entries("conv2", ch, ch))
    sd.update(_conv_entries("upsampling1.0", ch, ch))
    sd.update(_conv_entries("upsampling2.0", ch, ch))
    sd.update(_conv_entries("conv3.0", ch, ch))
    sd.update(_conv_entries("conv4", ch, 3))

    converted = port.convert_rrdb_generator(sd, num_blocks=nb)

    model = create_model("rrdbnet_x4", channels=ch, growth_channels=gc, num_blocks=nb)
    want = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
    assert _tree_spec(converted) == _tree_spec(want)

    # converted weights actually run through the model
    out = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, converted)},
                      jnp.zeros((1, 8, 8, 3)))
    assert out.shape == (1, 32, 32, 3)


def test_unet_discriminator_converter_matches_flax_tree():
    c = 64
    sd = {}
    sd.update(_conv_entries("conv1", 3, 64))
    sd.update(_conv_entries("down_block1.0", c, c * 2, k=4, bias=False))
    sd.update(_conv_entries("down_block2.0", c * 2, c * 4, k=4, bias=False))
    sd.update(_conv_entries("down_block3.0", c * 4, c * 8, k=4, bias=False))
    sd.update(_conv_entries("up_block1.0", c * 8, c * 4, bias=False))
    sd.update(_conv_entries("up_block2.0", c * 4, c * 2, bias=False))
    sd.update(_conv_entries("up_block3.0", c * 2, c, bias=False))
    sd.update(_conv_entries("conv2.0", c, c, bias=False))
    sd.update(_conv_entries("conv3.0", c, c, bias=False))
    sd.update(_conv_entries("conv4", c, 1))

    converted = port.convert_unet_discriminator(sd)
    model = create_model("discriminator_unet")
    want = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    assert _tree_spec(converted) == _tree_spec(want)


def test_flatten_unflatten_roundtrip():
    tree = {"a": {"b": np.zeros((2, 2)), "c": {"d": np.ones(3)}}}
    flat = port.flatten(tree)
    back = port.unflatten(flat)
    assert _tree_spec(tree) == _tree_spec(back)
