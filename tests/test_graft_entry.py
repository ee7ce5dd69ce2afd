"""The driver contract: entry() returns a jittable forward, and
dryrun_multichip executes the full GAN step + spatial inference over the
virtual 8-device mesh."""

import sys
import pathlib

import jax
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import __graft_entry__ as graft  # noqa: E402


def test_dryrun_multichip(eight_devices, capsys):
    graft.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip(8) OK" in out


def test_entry_compiles_tiny():
    # entry() builds the full 23-block flagship; compile-check a traced
    # abstract evaluation instead of a real compile to keep the suite fast
    fn, (params, lr) = graft.entry()
    shape = jax.eval_shape(fn, params, lr)
    assert shape.shape == (4, 128, 128, 3)
