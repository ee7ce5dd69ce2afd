"""Convert srganfd_tpu Flax params back into reference PyTorch checkpoints.

The inverse of tools/port_torch_weights.py — completes the migration
story in both directions: users can train on TPU here and serve the
result with the reference's torch stack (its ``load_state_dict`` /
``save_checkpoint`` format, ``ESRGAN/utils.py:30-101``).

Usage:
    python tools/export_torch_weights.py --arch bsrgan_x4 \
        --ckpt samples/.../g_best.ckpt --out g_best.pth.tar
    python tools/export_torch_weights.py --arch rrdbnet_x4 \
        --npz ported.npz --out rrdbnet.pth.tar [--use-ema]

Inputs: an orbax checkpoint directory written by train/checkpoint.py
(``--ckpt``, picks ``g_params`` or ``ema_params``) or a flattened-npz
param dump in port_torch_weights' format (``--npz``). Scanned trunks
(``ScanRRDB``) are unstacked automatically.

Output: ``{"state_dict": <reference-named OIHW tensors>}`` saved with
``torch.save`` — loadable by the reference's shape-filtered loader and
by ``torch.load(..., weights_only=False)``.
"""

from __future__ import annotations

import argparse

import numpy as np


def _hwio_to_oihw(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))


def _num_trunk_blocks(params: dict) -> int:
    if any(k.startswith("ScanRRDB") for k in params):
        key = next(k for k in params if k.startswith("ScanRRDB"))
        inner = params[key]
        while isinstance(inner, dict):
            inner = next(iter(inner.values()))
        return int(np.asarray(inner).shape[0])
    return sum(1 for k in params if k.startswith("RRDB_"))


def _unstacked(params: dict) -> tuple[dict, int]:
    nb = _num_trunk_blocks(params)
    if any(k.startswith("ScanRRDB") for k in params):
        from srganfd_tpu.models.blocks import unstack_trunk_params

        params = unstack_trunk_params(params, nb)
    return params, nb


def export_rrdb_generator(params: dict) -> dict[str, np.ndarray]:
    """Inverse of ``port_torch_weights.convert_rrdb_generator``: our Flax
    tree (Conv_0, RRDB_{i}.ResidualDenseBlock_{j}.conv{k}_kernel, ...)
    -> reference naming (conv1, trunk.{i}.rdb{j}.conv{k}, conv2,
    upsampling{1..}.0, conv3[.0], conv4) with OIHW kernels."""
    params, nb = _unstacked(params)
    sd: dict[str, np.ndarray] = {}

    def put_conv(torch_name: str, node: dict) -> None:
        inner = node["Conv_0"] if "Conv_0" in node else node
        sd[f"{torch_name}.weight"] = _hwio_to_oihw(inner["kernel"])
        if "bias" in inner:
            sd[f"{torch_name}.bias"] = np.asarray(inner["bias"])

    put_conv("conv1", params["Conv_0"])
    for i in range(nb):
        rrdb = params[f"RRDB_{i}"]
        for j in range(3):
            rdb = rrdb[f"ResidualDenseBlock_{j}"]
            for k in range(5):
                sd[f"trunk.{i}.rdb{j + 1}.conv{k + 1}.weight"] = _hwio_to_oihw(
                    rdb[f"conv{k}_kernel"]
                )
                sd[f"trunk.{i}.rdb{j + 1}.conv{k + 1}.bias"] = np.asarray(
                    rdb[f"conv{k}_bias"]
                )
    put_conv("conv2", params["Conv_1"])

    # remaining convs in registration order: upsampling stages, conv3, conv4
    rest = sorted(
        (k for k in params if k.startswith("Conv_") and k not in ("Conv_0", "Conv_1")),
        key=lambda k: int(k.split("_")[1]),
    )
    n_up = len(rest) - 2
    names = [f"upsampling{u + 1}.0" for u in range(n_up)] + ["conv3.0", "conv4"]
    for flax_name, torch_name in zip(rest, names):
        put_conv(torch_name, params[flax_name])
    return sd


def _power_iteration(w2d: np.ndarray, iters: int = 30) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(0)
    u = rng.normal(size=w2d.shape[0]).astype(np.float64)
    u /= np.linalg.norm(u) + 1e-12
    v = np.zeros(w2d.shape[1])
    for _ in range(iters):
        v = w2d.T @ u
        v /= np.linalg.norm(v) + 1e-12
        u = w2d @ v
        u /= np.linalg.norm(u) + 1e-12
    return u, v


def export_unet_discriminator(params: dict) -> dict[str, np.ndarray]:
    """Inverse of ``port_torch_weights.convert_unet_discriminator``. SN
    convs emit the torch ``spectral_norm`` triplet (``weight_orig``,
    ``weight_u``, ``weight_v``) plus a converged ``weight`` so plain
    (non-SN) torch modules can also consume the dict."""
    sd: dict[str, np.ndarray] = {}

    def put_plain(torch_name: str, node: dict) -> None:
        inner = node["Conv_0"] if "Conv_0" in node else node
        sd[f"{torch_name}.weight"] = _hwio_to_oihw(inner["kernel"])
        if "bias" in inner:
            sd[f"{torch_name}.bias"] = np.asarray(inner["bias"])

    put_plain("conv1", params["Conv_0"])
    sn_targets = [
        "down_block1.0",
        "down_block2.0",
        "down_block3.0",
        "up_block1.0",
        "up_block2.0",
        "up_block3.0",
        "conv2.0",
        "conv3.0",
    ]
    for i, torch_name in enumerate(sn_targets):
        kern = _hwio_to_oihw(params[f"SNConv_{i}"]["kernel"])  # (O, I, H, W)
        w2d = kern.reshape(kern.shape[0], -1).astype(np.float64)
        u, v = _power_iteration(w2d)
        sigma = float(u @ w2d @ v)
        sd[f"{torch_name}.weight_orig"] = kern
        sd[f"{torch_name}.weight_u"] = u.astype(np.float32)
        sd[f"{torch_name}.weight_v"] = v.astype(np.float32)
        sd[f"{torch_name}.weight"] = (kern / sigma).astype(np.float32)
    put_plain("conv4", params["Conv_1"])
    return sd


def load_params(args: argparse.Namespace) -> dict:
    if args.npz:
        import port_torch_weights as port

        with np.load(args.npz) as z:
            return port.unflatten({k: z[k] for k in z.files})
    from srganfd_tpu.train.checkpoint import load_checkpoint

    ckpt = load_checkpoint(args.ckpt)
    # load_checkpoint nests the pytree under "state" (train/checkpoint.py
    # payload layout); the GanTrainState field names are g_params /
    # ema_g_params / d_params (train/state.py:17-21)
    state = ckpt.get("state", ckpt)
    key = "ema_g_params" if args.use_ema else "g_params"
    if args.discriminator:
        key = "d_params"
    if key not in state:
        raise SystemExit(f"checkpoint has no {key!r} (keys: {sorted(state)})")
    return state[key]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", required=True)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--ckpt", default="", help="orbax checkpoint dir (train/checkpoint.py)")
    src.add_argument("--npz", default="", help="flattened-npz params (port_torch_weights format)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--use-ema", action="store_true")
    ap.add_argument("--discriminator", action="store_true")
    args = ap.parse_args()

    params = load_params(args)
    if args.discriminator or args.arch == "discriminator_unet":
        sd = export_unet_discriminator(params)
    elif args.arch.startswith("bsrgantrans"):
        # the transformer bottleneck (Conv_1 downsample + encoder layers)
        # has no counterpart in export_rrdb_generator's name map — a silent
        # mis-export would load garbage through the reference's
        # shape-filtered loader with no diagnostic
        raise SystemExit(f"no exporter for arch {args.arch!r} (transformer bottleneck)")
    elif args.arch.startswith(("rrdbnet", "bsrgan", "realesrgan")):
        sd = export_rrdb_generator(params)
    else:
        raise SystemExit(f"no exporter for arch {args.arch!r}")

    import torch

    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}}, args.out)
    print(f"wrote {args.out} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
