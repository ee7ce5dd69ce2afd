"""Model zoo shape/behavior tests: every registry arch initializes and
produces the reference-documented output shape on tiny inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srganfd_tpu import models
from srganfd_tpu.models import blocks


def _init_apply(model, x, train=False, **apply_kw):
    variables = model.init(jax.random.PRNGKey(0), x)
    mutable = [k for k in variables if k != "params"]
    if mutable:
        out, _ = model.apply(variables, x, mutable=mutable, **apply_kw)
        return out
    return model.apply(variables, x, **apply_kw)


GEN_CASES = [
    # (arch, lr_shape, expected_sr_shape, extra kwargs)
    ("rrdbnet_x1", (1, 12, 12, 3), (1, 12, 12, 3)),
    ("rrdbnet_x2", (1, 8, 8, 3), (1, 16, 16, 3)),
    ("rrdbnet_x4", (1, 8, 8, 3), (1, 32, 32, 3)),
    ("rrdbnet_x8", (1, 4, 4, 3), (1, 32, 32, 3)),
    ("bsrgan_x2", (1, 8, 8, 3), (1, 16, 16, 3)),
    ("bsrgan_x4", (1, 8, 8, 3), (1, 32, 32, 3)),
    ("bsrgansa_x2", (1, 8, 8, 3), (1, 16, 16, 3)),
    ("bsrgantrans_x2", (1, 8, 8, 3), (1, 16, 16, 3)),
    ("realesrgan_x4", (1, 8, 8, 3), (1, 32, 32, 3)),
    ("realesrgan_x2", (1, 8, 8, 3), (1, 16, 16, 3)),
    ("gen_rpa2x", (1, 8, 8, 3), (1, 16, 16, 3)),
    ("gen_rrdb2x", (1, 8, 8, 3), (1, 16, 16, 3)),
]


@pytest.mark.parametrize("arch,in_shape,out_shape", GEN_CASES)
def test_generator_shapes(arch, in_shape, out_shape):
    model = models.create_model(arch, num_blocks=2) if "rrdbnet_x" in arch else None
    if model is None:
        try:
            model = models.create_model(arch, num_rrdb=2)
        except TypeError:
            model = models.create_model(arch, num_block=2)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=in_shape).astype(np.float32))
    sr = _init_apply(model, x)
    assert sr.shape == out_shape
    if arch.startswith(("rrdbnet", "bsrgan", "realesrgan")):
        assert float(sr.min()) >= 0.0 and float(sr.max()) <= 1.0  # clamp parity


def test_vgg_discriminator_scalar_logit():
    d = models.create_model("discriminator")
    x = jnp.zeros((2, 128, 128, 3))
    out = _init_apply(d, x)
    assert out.shape == (2, 1)


def test_unet_discriminator_pixel_map():
    d = models.create_model("discriminator_unet")
    x = jnp.zeros((2, 32, 32, 3))
    out = _init_apply(d, x)
    assert out.shape == (2, 32, 32, 1)


def test_unet_sa_discriminator_returns_attention():
    d = models.create_model("discriminator_unet_sa")
    x = jnp.zeros((1, 16, 16, 3))
    out, attn = _init_apply(d, x)
    assert out.shape == (1, 16, 16, 1)
    # up1 runs at H/4: attention weights over (H/4 * W/4) = 16 tokens
    assert attn.shape == (1, 16, 16)


def test_attention_unet_discriminator():
    d = models.create_model("discriminator_attention_unet")
    x = jnp.zeros((1, 32, 32, 3))
    out, (ly1, ly2, ly3) = _init_apply(d, x)
    assert out.shape == (1, 32, 32, 1)
    assert ly1.shape == (1, 8, 8, 1)
    assert ly2.shape == (1, 16, 16, 1)
    assert ly3.shape == (1, 32, 32, 1)


def test_spectral_norm_updates_u():
    d = models.create_model("discriminator_unet")
    x = jnp.zeros((1, 16, 16, 3))
    variables = d.init(jax.random.PRNGKey(0), x)
    _, updated = d.apply(variables, x, train=True, mutable=["spectral"])
    leaves_before = jax.tree_util.tree_leaves(variables["spectral"])
    leaves_after = jax.tree_util.tree_leaves(updated["spectral"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_before, leaves_after)
    )
    assert changed


def test_pixel_unshuffle_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 8, 8, 4)).astype(np.float32)
    want = (
        torch.nn.functional.pixel_unshuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    got = np.asarray(blocks.pixel_unshuffle(jnp.asarray(x), 2))
    np.testing.assert_allclose(got, want)
    # and the inverse
    back = np.asarray(blocks.pixel_shuffle(jnp.asarray(got), 2))
    np.testing.assert_allclose(back, x)


def test_registry_unknown_name():
    with pytest.raises(KeyError):
        models.create_model("not_an_arch")


def test_multiscale_attention_discriminator():
    d = models.create_model("discriminator_attention_unet_ms", num_scales=2)
    x = jnp.zeros((1, 32, 32, 3))
    (outs, attns) = _init_apply(d, x)
    assert len(outs) == 2
    assert outs[0].shape == (1, 32, 32, 1)
    assert outs[1].shape == (1, 16, 16, 1)
    assert len(attns) == 3  # full-res scale attention maps
