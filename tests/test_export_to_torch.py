"""tools/export_to_torch.py: the trained-checkpoint -> twin export leg.

Round-trips tools/port_torch_weights.py's generator conversion: a twin
state dict ported to Flax and exported back must be bit-identical, and
an exported Flax init must load into the twin with matching outputs —
the precondition for running tools/parity_table.py on OUR trained
checkpoints (VERDICT r4 item 7) instead of reference .pth files.
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))

torch = pytest.importorskip("torch")

from export_to_torch import export_rrdb_generator  # noqa: E402
from port_torch_weights import convert_rrdb_generator, load_torch_state_dict  # noqa: E402
from torch_twins import build_twin  # noqa: E402

TINY = dict(channels=8, growth_channels=4, num_blocks=2)


def _twin_sd_numpy(twin) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in twin.state_dict().items()}


@pytest.mark.parametrize("arch", ["bsrgan_x2", "bsrgan_x4", "rrdbnet_x4"])
def test_port_export_round_trip(arch):
    torch.manual_seed(0)
    twin = build_twin(arch, **TINY)
    sd = _twin_sd_numpy(twin)
    flax_params = convert_rrdb_generator(sd, num_blocks=TINY["num_blocks"])
    back = export_rrdb_generator(flax_params)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_export_scanned_trunk_layout():
    """ScanRRDB (stacked) checkpoints export identically to unrolled ones."""
    from srganfd_tpu.models.blocks import stack_trunk_params

    torch.manual_seed(1)
    twin = build_twin("bsrgan_x2", **TINY)
    flax_params = convert_rrdb_generator(_twin_sd_numpy(twin), num_blocks=2)
    stacked = stack_trunk_params(flax_params, num_blocks=2)
    assert "ScanRRDB" in stacked
    a = export_rrdb_generator(flax_params)
    b = export_rrdb_generator(stacked)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_exported_flax_init_runs_in_twin():
    """A Flax-initialized generator exports to a sd the twin loads
    strictly, and both sides produce the same SR output."""
    import jax
    import jax.numpy as jnp

    from srganfd_tpu.models import create_model

    model = create_model(
        "bsrgan_x2", channels=TINY["channels"],
        growth_channels=TINY["growth_channels"], num_rrdb=TINY["num_blocks"],
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))["params"]
    params = jax.tree_util.tree_map(np.asarray, params)
    sd = export_rrdb_generator(params)

    twin = build_twin("bsrgan_x2", **TINY)
    missing, unexpected = twin.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    assert not missing and not unexpected

    x = np.random.default_rng(2).random((1, 12, 12, 3), dtype=np.float32)
    ours = model.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        theirs = twin(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), atol=3e-5
    )
