"""Loss tests: BCE parity vs torch, relativistic forms, VGG content loss
gradients (incl. the reference's detach bug replication flag), LPIPS
behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srganfd_tpu.losses import content as content_mod
from srganfd_tpu.losses import gan, lpips as lpips_mod


def test_bce_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 8, 8, 1)).astype(np.float32)
    targets = rng.uniform(size=(4, 8, 8, 1)).astype(np.float32)
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets)
    ).item()
    got = float(gan.bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(got - want) < 1e-6


def test_relativistic_losses_symmetry():
    rng = np.random.default_rng(1)
    real = jnp.asarray(rng.normal(size=(4, 1)).astype(np.float32))
    fake = jnp.asarray(rng.normal(size=(4, 1)).astype(np.float32))
    d = float(gan.relativistic_d_loss(real, fake))
    g = float(gan.relativistic_g_loss(real, fake))
    assert np.isfinite(d) and np.isfinite(g)
    # when D is right (real >> fake), D loss small, G loss large
    d2 = float(gan.relativistic_d_loss(real + 10, fake - 10))
    g2 = float(gan.relativistic_g_loss(real + 10, fake - 10))
    assert d2 < d and g2 > g


def test_vgg19_feature_shapes():
    mod = content_mod.VGG19Features(nodes=("features.2", "features.34"))
    variables, pretrained = content_mod.load_vgg19_params(("features.2", "features.34"))
    feats = mod.apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert feats[0].shape == (1, 64, 64, 64)  # conv1_2: full res, 64ch
    assert feats[1].shape == (1, 4, 4, 512)  # conv5_4: /16 res, 512ch
    assert isinstance(pretrained, bool)


def test_content_loss_gradient_flows_and_detach_bug():
    loss = content_mod.ContentLoss(nodes=("features.2",), weights=[1.0])
    loss_bug = content_mod.ContentLoss(nodes=("features.2",), weights=[1.0], detach_bug=True)
    gt = jnp.ones((1, 16, 16, 3)) * 0.5
    sr0 = jnp.ones((1, 16, 16, 3)) * 0.3

    g = jax.grad(lambda sr: loss(sr, gt))(sr0)
    assert float(jnp.abs(g).sum()) > 0.0
    g_bug = jax.grad(lambda sr: loss_bug(sr, gt))(sr0)
    assert float(jnp.abs(g_bug).sum()) == 0.0  # reference bug: no gradient
    # but the VALUE matches the non-bug version
    assert abs(float(loss(sr0, gt)) - float(loss_bug(sr0, gt))) < 1e-6


def test_content_loss_multi_node_weighting():
    nodes = ("features.2", "features.7")
    loss = content_mod.ContentLoss(nodes=nodes, weights=[1.0, 0.0])
    per = loss.per_node(jnp.zeros((1, 16, 16, 3)), jnp.ones((1, 16, 16, 3)) * 0.1)
    assert per.shape == (2,)
    total = float(loss(jnp.zeros((1, 16, 16, 3)), jnp.ones((1, 16, 16, 3)) * 0.1))
    assert abs(total - float(per[0])) < 1e-6  # second node zero-weighted


def test_lpips_basic_properties():
    lp = lpips_mod.Lpips()
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    same = np.asarray(lp(a, a))
    diff = np.asarray(lp(a, b))
    assert same.shape == (2,)
    np.testing.assert_allclose(same, 0.0, atol=1e-6)
    assert (diff > 0).all()
