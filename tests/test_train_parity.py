"""Optimizer-level lockstep training parity vs the reference trainer.

The strongest end-to-end parity statement available without pretrained
weights: run N full L1-pretrain updates of the reference's training rule
(reference RRDBNet topology in raw torch + ``torch.optim.Adam`` + the
weighted-L1 pixel criterion — the update of ``ESRGAN/train_rrdbnet.py``
driving ``ESRGAN/model.py:144-235``, weights/betas/eps from
``ESRGAN/esrgan_config.py``) and N steps of our jitted ``Trainer`` from
the SAME ported initialization on the SAME batches, then require the
final parameter trees to agree to f32 roundoff.  Passing proves the
model forward, the loss semantics, the gradients through clamp/LeakyReLU
/nearest-upsample, the Adam implementation (bias correction + eps
placement) and the schedule all match the reference simultaneously —
anything off by one epsilon placement diverges measurably within steps.
"""

import pathlib
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
import port_torch_weights as port  # noqa: E402
from test_generator_arch_parity import _TorchRRDBNetX4  # noqa: E402

from srganfd_tpu.configs import get_config  # noqa: E402
from srganfd_tpu.train.loop import Trainer  # noqa: E402

N_STEPS = 3
BATCH, GT, SF = 2, 24, 4


def _flat(tree):
    return {
        "/".join(str(k.key) for k in path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_rrdbnet_pretrain_lockstep_with_reference_trainer():
    torch.manual_seed(0)
    tmodel = _TorchRRDBNetX4(ch=8, gc=4, nb=2)
    sd0 = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}
    init = port.convert_rrdb_generator(sd0, num_blocks=2)

    cfg = get_config("rrdbnet").replace(
        compute_dtype="float32",
        g_kwargs={"channels": 8, "growth_channels": 4, "num_blocks": 2},
    )
    # the reference update rule, torch side (ESRGAN/train_rrdbnet.py):
    # weighted-mean L1 + Adam(model_lr, model_betas, model_eps); the
    # MultiStepLR milestones are epochs away, so lr is constant here.
    opt = torch.optim.Adam(
        tmodel.parameters(),
        lr=cfg.model_lr,
        betas=cfg.model_betas,
        eps=cfg.model_eps,
        weight_decay=cfg.model_weight_decay,
    )
    crit = torch.nn.L1Loss()
    w = cfg.pixel_weight[0]

    tr = Trainer(cfg, steps_per_epoch=1000)
    rng = np.random.default_rng(42)
    gts = rng.uniform(size=(N_STEPS, BATCH, GT, GT, 3)).astype(np.float32)
    lrs = gts[:, :, ::SF, ::SF, :]

    state = tr.init_state(
        jax.random.PRNGKey(0), lrs.shape[1:], gts.shape[1:]
    )
    ported = jax.tree_util.tree_map(jnp.asarray, init)
    state = state.replace(
        g_params=ported,
        g_opt_state=tr.g_tx.init(ported),
        ema_g_params=jax.tree_util.tree_map(jnp.copy, ported),
    )

    torch_losses, jax_losses = [], []
    for i in range(N_STEPS):
        gt_t = torch.from_numpy(np.moveaxis(gts[i], -1, 1))
        lr_t = torch.from_numpy(np.moveaxis(lrs[i], -1, 1))
        opt.zero_grad()
        loss = w * crit(tmodel(lr_t), gt_t)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

        state, metrics = tr.train_step(
            state, jnp.asarray(gts[i]), jnp.asarray(lrs[i])
        )
        jax_losses.append(float(metrics["pixel_loss"]))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-6, atol=2e-7)

    sdN = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    want = _flat(port.convert_rrdb_generator(sdN, num_blocks=2))
    got = _flat(state.g_params)
    assert set(got) == set(want)
    for name in sorted(want):
        np.testing.assert_allclose(
            got[name], want[name], rtol=5e-4, atol=2e-6,
            err_msg=f"{name} diverged after {N_STEPS} lockstep updates",
        )

    # the updates are real: parameters moved from init by >> tolerance
    init_flat = _flat(init)
    moved = max(
        float(np.max(np.abs(got[n] - init_flat[n]))) for n in sorted(want)
    )
    assert moved > 1e-4, f"suspiciously small update {moved}"
