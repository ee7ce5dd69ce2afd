#!/bin/sh
# One-shot hardware measurement sweep for when the axon TPU terminal is
# healthy again (round 1 shipped without numbers — see ROUND_NOTES.md).
# Run from the repo root; ONE TPU process at a time.
set -e
echo "== health check"
timeout 180 python -c "import jax; print(jax.devices()); import jax.numpy as jnp; x=jnp.ones((512,512)); print(float((x@x).sum()))"
echo "== headline bench (writes the BENCH json line)"
python bench.py
echo "== profile sweep (G fwd MP/s, GAN step, degradation, Pallas vs XLA)"
python tools/tpu_profile.py
echo "== done; record results in ROUND_NOTES.md and gate Pallas wiring on the comparison"
