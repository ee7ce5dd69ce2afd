"""Convert reference PyTorch checkpoints to srganfd_tpu Flax params.

Usage:
    python tools/port_torch_weights.py --arch rrdbnet_x4 \
        --pth RRDBNet_x4-DFO2K.pth.tar --out rrdbnet_x4.npz

Supports the reference checkpoint formats (``ESRGAN/utils.py:85-101``
``{"state_dict": ...}`` dicts or bare state dicts) for the RRDB-family
generators (``rrdbnet_*``, ``bsrgan_*``, ``realesrgan_*``) and the U-Net
discriminator. Conv kernels transpose OIHW -> HWIO; spectral-norm
``weight_orig`` entries map to the SN conv kernels.

Also provides ``vgg19_to_npz`` / ``lpips_to_npz`` converters for the
perceptual-loss weights (run wherever torchvision/lpips are installed;
the outputs feed SRGANFD_VGG19_NPZ / SRGANFD_LPIPS_NPZ).
"""

from __future__ import annotations

import argparse

import numpy as np


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload) if isinstance(payload, dict) else payload
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("module.")
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def convert_rrdb_generator(sd: dict[str, np.ndarray], num_blocks: int = 23) -> dict:
    """Reference RRDBNet/BSRGAN naming (conv1, trunk.{i}.rdb{j}.conv{k},
    conv2, upsampling{1,2,3}.0, conv3.0, conv4) -> our auto-named Flax tree
    (Conv_0, RRDB_{i}.ResidualDenseBlock_{j}.Conv_{k}, Conv_1, ...)."""
    params: dict = {}

    def put_conv(flax_name: str, torch_prefix: str, container: dict) -> None:
        # our Conv wrapper nests an inner nn.Conv named Conv_0
        container[flax_name] = {
            "Conv_0": {
                "kernel": _oihw_to_hwio(sd[f"{torch_prefix}.weight"]),
                **(
                    {"bias": sd[f"{torch_prefix}.bias"]}
                    if f"{torch_prefix}.bias" in sd
                    else {}
                ),
            }
        }

    put_conv("Conv_0", "conv1", params)
    for i in range(num_blocks):
        rrdb: dict = {}
        for j in range(3):
            # RDB stores flat reference-shaped conv params (see
            # srganfd_tpu.models.blocks.ResidualDenseBlock fused layout)
            rdb: dict = {}
            for k in range(5):
                rdb[f"conv{k}_kernel"] = _oihw_to_hwio(
                    sd[f"trunk.{i}.rdb{j + 1}.conv{k + 1}.weight"]
                )
                rdb[f"conv{k}_bias"] = sd[f"trunk.{i}.rdb{j + 1}.conv{k + 1}.bias"]
            rrdb[f"ResidualDenseBlock_{j}"] = rdb
        params[f"RRDB_{i}"] = rrdb
    put_conv("Conv_1", "conv2", params)

    conv_idx = 2
    for up in ("upsampling1", "upsampling2", "upsampling3"):
        if f"{up}.0.weight" in sd:
            put_conv(f"Conv_{conv_idx}", f"{up}.0", params)
            conv_idx += 1
    if "conv3.0.weight" in sd:
        put_conv(f"Conv_{conv_idx}", "conv3.0", params)
    else:
        put_conv(f"Conv_{conv_idx}", "conv3", params)
    conv_idx += 1
    put_conv(f"Conv_{conv_idx}", "conv4", params)
    return params


def convert_unet_discriminator(sd: dict[str, np.ndarray]) -> dict:
    """Reference DiscriminatorUNet naming (conv1, down_block{1..3}.0,
    up_block{1..3}.0, conv2.0, conv3.0, conv4; SN convs store
    ``weight_orig``) -> our tree (Conv_0, SNConv_0..7, Conv_1)."""

    def kernel_of(prefix: str) -> np.ndarray:
        key = f"{prefix}.weight_orig" if f"{prefix}.weight_orig" in sd else f"{prefix}.weight"
        return _oihw_to_hwio(sd[key])

    params: dict = {
        "Conv_0": {
            "Conv_0": {
                "kernel": _oihw_to_hwio(sd["conv1.weight"]),
                "bias": sd["conv1.bias"],
            }
        }
    }
    sn_sources = [
        "down_block1.0",
        "down_block2.0",
        "down_block3.0",
        "up_block1.0",
        "up_block2.0",
        "up_block3.0",
        "conv2.0",
        "conv3.0",
    ]
    for i, src in enumerate(sn_sources):
        params[f"SNConv_{i}"] = {"kernel": kernel_of(src)}
    params["Conv_1"] = {
        "Conv_0": {
            "kernel": _oihw_to_hwio(sd["conv4.weight"]),
            "bias": sd["conv4.bias"],
        }
    }
    return params


def convert_attention_unet_discriminator(
    sd: dict[str, np.ndarray]
) -> tuple[dict, dict]:
    """A-ESRGAN ``UNetDiscriminatorAesrgan`` naming (conv0..conv9, gating,
    attn_{1..3}.{theta,phi,psi,W.0,W.1}, cat_{1..3}.convU —
    ``A-ESRGAN/model.py:279-352``) -> our ``AttentionUNetDiscriminator``
    tree. Returns ``(params, batch_stats)`` (the attention gates' BN
    running stats live in a separate Flax collection)."""

    def kernel_of(prefix: str) -> np.ndarray:
        key = f"{prefix}.weight_orig" if f"{prefix}.weight_orig" in sd else f"{prefix}.weight"
        return _oihw_to_hwio(sd[key])

    def conv(prefix: str, bias: bool = True) -> dict:
        entry = {"kernel": _oihw_to_hwio(sd[f"{prefix}.weight"])}
        if bias:
            entry["bias"] = sd[f"{prefix}.bias"]
        return {"Conv_0": entry}

    params: dict = {"Conv_0": conv("conv0"), "Conv_1": conv("conv9")}
    # top-level SN convs in our module's call order (SNConv_3 is the
    # reference's 1x1-padding-1 gating quirk)
    top_sn = ["conv1", "conv2", "conv3", "gating", "conv4", "conv5", "conv6", "conv7", "conv8"]
    for i, src in enumerate(top_sn):
        params[f"SNConv_{i}"] = {"kernel": kernel_of(src)}
    stats: dict = {}
    for i, src in enumerate(["attn_1", "attn_2", "attn_3"]):
        params[f"_AddAttn_{i}"] = {
            "Conv_0": conv(f"{src}.theta", bias=False),  # k2/s2 gate query
            "Conv_1": conv(f"{src}.phi"),
            "Conv_2": conv(f"{src}.psi"),
            "Conv_3": conv(f"{src}.W.0"),  # gated 1x1
            "BatchNorm_0": {
                "scale": sd[f"{src}.W.1.weight"],
                "bias": sd[f"{src}.W.1.bias"],
            },
        }
        stats[f"_AddAttn_{i}"] = {
            "BatchNorm_0": {
                "mean": sd[f"{src}.W.1.running_mean"],
                "var": sd[f"{src}.W.1.running_var"],
            }
        }
    for i, src in enumerate(["cat_1", "cat_2", "cat_3"]):
        params[f"_UNetCat_{i}"] = {"SNConv_0": {"kernel": kernel_of(f"{src}.convU")}}
    return params, stats


def convert_vgg_discriminator(sd: dict[str, np.ndarray]) -> tuple[dict, dict]:
    """Reference ESRGAN VGG-128 Discriminator naming (one ``features``
    Sequential of conv/BN/LeakyReLU entries + a ``classifier`` of two
    Linears, ``ESRGAN/model.py:89-141``) -> our ``DiscriminatorVGG128``
    tree. Returns ``(params, batch_stats)`` — BN running stats are a
    separate variable collection in Flax."""
    conv_idx = [0, 2, 5, 8, 11, 14, 17, 20, 23, 26]
    bn_idx = [3, 6, 9, 12, 15, 18, 21, 24, 27]
    params: dict = {}
    stats: dict = {}
    for i, src in enumerate(conv_idx):
        entry = {"kernel": _oihw_to_hwio(sd[f"features.{src}.weight"])}
        if f"features.{src}.bias" in sd:
            entry["bias"] = sd[f"features.{src}.bias"]
        params[f"Conv_{i}"] = {"Conv_0": entry}
    for i, src in enumerate(bn_idx):
        params[f"BatchNorm_{i}"] = {
            "scale": sd[f"features.{src}.weight"],
            "bias": sd[f"features.{src}.bias"],
        }
        stats[f"BatchNorm_{i}"] = {
            "mean": sd[f"features.{src}.running_mean"],
            "var": sd[f"features.{src}.running_var"],
        }
    # our flatten matches torch's c-major order (the module transposes to
    # NCHW before reshape), so Linear weights transpose directly
    params["Dense_0"] = {
        "kernel": np.ascontiguousarray(sd["classifier.0.weight"].T),
        "bias": sd["classifier.0.bias"],
    }
    params["Dense_1"] = {
        "kernel": np.ascontiguousarray(sd["classifier.2.weight"].T),
        "bias": sd["classifier.2.bias"],
    }
    return params, stats


def flatten(tree: dict, prefix: str = "") -> dict[str, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        name = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(flatten(v, name))
        else:
            flat[name] = np.asarray(v)
    return flat


def unflatten(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def vgg19_to_npz(out_path: str) -> None:
    """Run where torchvision exists: dumps IMAGENET1K_V1 VGG19 features."""
    from torchvision.models import VGG19_Weights, vgg19

    model = vgg19(weights=VGG19_Weights.IMAGENET1K_V1).features
    arrays = {}
    for i, layer in enumerate(model):
        if hasattr(layer, "weight") and layer.weight is not None:
            arrays[f"features.{i}.weight"] = layer.weight.detach().numpy()
            arrays[f"features.{i}.bias"] = layer.bias.detach().numpy()
    np.savez(out_path, **arrays)


def lpips_to_npz(out_path: str) -> None:
    """Run where the lpips pip package exists: dumps alex backbone + heads."""
    import lpips as lpips_pkg

    m = lpips_pkg.LPIPS(net="alex")
    arrays = {}
    convs = [l for l in m.net.modules() if l.__class__.__name__ == "Conv2d"]
    for i, conv in enumerate(convs[:5]):
        arrays[f"alex.{i}.weight"] = conv.weight.detach().numpy()
        arrays[f"alex.{i}.bias"] = conv.bias.detach().numpy()
    for i, lin in enumerate(m.lins):
        arrays[f"lin.{i}.weight"] = lin.model[-1].weight.detach().numpy()
    np.savez(out_path, **arrays)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", required=True)
    ap.add_argument("--pth", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-blocks", type=int, default=23)
    args = ap.parse_args()

    sd = load_torch_state_dict(args.pth)
    if args.arch.startswith(("rrdbnet", "bsrgan", "realesrgan")):
        params = convert_rrdb_generator(sd, args.num_blocks)
    elif args.arch == "discriminator_unet":
        params = convert_unet_discriminator(sd)
    elif args.arch == "discriminator":  # ESRGAN's VGG-128 D
        params, stats = convert_vgg_discriminator(sd)
        params = dict(params, **{"batch_stats": stats})
    elif args.arch in ("discriminator_attention_unet", "uNetDiscriminatorAesrgan"):
        params, stats = convert_attention_unet_discriminator(sd)
        params = dict(params, **{"batch_stats": stats})
    else:
        raise SystemExit(f"no converter for arch {args.arch!r}")
    np.savez(args.out, **flatten(params))
    print(f"wrote {args.out} ({len(flatten(params))} arrays)")


if __name__ == "__main__":
    main()
