"""Export a trained srganfd_tpu generator checkpoint to a reference-named
torch ``.pth`` — the inverse of ``tools/port_torch_weights.py``.

Usage:
    python tools/export_to_torch.py --arch bsrgan_x2 \
        --ckpt results/BSRGAN_x2/ckpt_best --key g_params --out trained.pth

Why: ``tools/parity_table.py``'s twin leg loads reference-named state
dicts (``tools/torch_twins.py``; naming matches ``BSRGAN/model.py``'s
RRDBNet state dicts). Exporting OUR trained weights through this tool
lets the 0.1 dB parity gate run on *trained* checkpoints — our Flax
generator and the reference-topology torch twin evaluate the SAME
weights on the SAME frames (VERDICT r4 item 7).

Accepts Orbax checkpoint dirs (``--key`` picks ``g_params`` /
``ema_g_params``), MLflow ``runs:/`` URIs, or ported ``.npz`` files;
scanned-trunk layouts (``ScanRRDB``) unstack automatically.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _hwio_to_oihw(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))


def _get_conv(container: dict, flax_name: str) -> tuple[np.ndarray, np.ndarray | None]:
    inner = container[flax_name]["Conv_0"]
    return np.asarray(inner["kernel"]), (
        np.asarray(inner["bias"]) if "bias" in inner else None
    )


def export_rrdb_generator(params: dict) -> dict[str, np.ndarray]:
    """Flax generator tree (unrolled or scanned trunk) -> reference-named
    numpy state dict (inverse of ``convert_rrdb_generator``)."""
    from srganfd_tpu.models.blocks import unstack_trunk_params

    params = {k: v for k, v in params.items()}
    if any(k.startswith("ScanRRDB") for k in params):
        key = next(k for k in params if k.startswith("ScanRRDB"))
        stacked_leaf = next(iter(next(iter(params[key].values())).values()))
        while isinstance(stacked_leaf, dict):
            stacked_leaf = next(iter(stacked_leaf.values()))
        num_blocks = int(np.asarray(stacked_leaf).shape[0])
        params = unstack_trunk_params(params, num_blocks)
    num_blocks = sum(1 for k in params if k.startswith("RRDB_"))
    if num_blocks == 0:
        raise SystemExit("no RRDB_* / ScanRRDB trunk in the param tree")

    sd: dict[str, np.ndarray] = {}

    def put_conv(flax_name: str, torch_prefix: str) -> None:
        kernel, bias = _get_conv(params, flax_name)
        sd[f"{torch_prefix}.weight"] = _hwio_to_oihw(kernel)
        if bias is not None:
            sd[f"{torch_prefix}.bias"] = np.asarray(bias)

    put_conv("Conv_0", "conv1")
    for i in range(num_blocks):
        for j in range(3):
            rdb = params[f"RRDB_{i}"][f"ResidualDenseBlock_{j}"]
            for k in range(5):
                sd[f"trunk.{i}.rdb{j + 1}.conv{k + 1}.weight"] = _hwio_to_oihw(
                    rdb[f"conv{k}_kernel"]
                )
                sd[f"trunk.{i}.rdb{j + 1}.conv{k + 1}.bias"] = np.asarray(
                    rdb[f"conv{k}_bias"]
                )
    put_conv("Conv_1", "conv2")

    # remaining convs in call order: upsampling stages, then conv3.0, conv4
    rest = sorted(
        (k for k in params if k.startswith("Conv_") and k not in ("Conv_0", "Conv_1")),
        key=lambda k: int(k.split("_")[1]),
    )
    if len(rest) < 2:
        raise SystemExit(f"expected >=2 tail convs, found {rest}")
    n_up = len(rest) - 2
    for u in range(n_up):
        put_conv(rest[u], f"upsampling{u + 1}.0")
    put_conv(rest[-2], "conv3.0")
    put_conv(rest[-1], "conv4")
    return sd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", required=True, help="e.g. bsrgan_x2 (rrdbnet family)")
    ap.add_argument("--ckpt", required=True, help="Orbax dir, runs:/ URI, or .npz")
    ap.add_argument("--key", default="g_params", choices=["g_params", "ema_g_params"])
    ap.add_argument("--out", required=True, help="output .pth path")
    args = ap.parse_args()

    from srganfd_tpu.train.checkpoint import load_pretrained_params

    params = load_pretrained_params(args.ckpt, key=args.key)
    sd = export_rrdb_generator(params)

    import torch

    torch_sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    torch.save({"state_dict": torch_sd}, args.out)
    print(f"exported {len(sd)} tensors ({args.arch}, {args.key}) -> {args.out}")


if __name__ == "__main__":
    main()
