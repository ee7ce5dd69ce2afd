"""Super-resolution inference CLI.

Parity target: ``ESRGAN/inference.py:79-102`` (the reference's only
argparse entry point): build arch by name, load weights, SR one image,
write PNG. Device choice maps cpu/cuda -> cpu/tpu.

Beyond the reference: pass a DIRECTORY as ``--inputs-path`` to SR a
frame sequence (the thesis's CFD serving workload). Frames are bucketed
by shape and batched (``--batch``), with one compiled program per
(shape, batch) and the next batch submitted before the previous one is
fetched, so host decode/write overlaps device compute.

Usage:
    python -m srganfd_tpu.cli.infer --model-arch rrdbnet_x4 \
        --inputs-path in.png --output-path out.png \
        [--weights results/exp/ckpt_best] [--device cpu]
    python -m srganfd_tpu.cli.infer --model-arch bsrgan_x4 \
        --inputs-path frames/ --output-path sr_frames/ --batch 8 --half
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from srganfd_tpu.data.datasets import load_image_rgb
from srganfd_tpu.models import create_model
from srganfd_tpu.train import checkpoint as ckpt


def choice_device(device_type: str) -> None:
    if device_type == "cpu":
        jax.config.update("jax_platforms", "cpu")


def build_model(arch: str):
    return create_model(arch)


def _image_hw(path: str) -> tuple[int, int]:
    """(H, W) from the image header only — bucketing a long frame sequence
    must not pay a full decode per frame (the batch loop decodes once)."""
    try:
        from PIL import Image

        with Image.open(path) as im:
            w, h = im.size
        return (h, w)
    except Exception:
        import cv2

        img = cv2.imread(path)
        if img is None:
            raise ValueError(f"unreadable image: {path}")
        return img.shape[:2]


def run_sequence(
    apply_fn,
    params,
    paths: list[str],
    out_dir: str,
    batch: int = 8,
    mesh=None,
) -> dict:
    """SR a frame sequence: shape-bucketed, batched, pipelined.

    One compiled program per (H, W, batch) bucket (ragged tails pad by
    repeating the last frame — no extra compile). Batches are submitted
    one ahead of the fetch, so PNG decode/write on the host overlaps the
    device computation of the next batch (JAX dispatch is async; only the
    ``np.asarray`` fetch blocks). With ``mesh`` (``--data-shard``) the
    frame batch is sharded over the data axis — multi-chip sequence
    serving; per-frame outputs are sharding-invariant. Returns
    {"frames": n, "buckets": k}.
    """
    import collections

    import cv2

    os.makedirs(out_dir, exist_ok=True)
    by_shape: dict[tuple, list[str]] = collections.defaultdict(list)
    for p in paths:
        by_shape[_image_hw(p)].append(p)

    def write_results(sr_dev, batch_paths):
        sr_np = np.asarray(sr_dev)  # the only blocking fetch
        for out_img, path in zip(sr_np, batch_paths):
            sr8 = np.clip(out_img * 255.0, 0, 255).astype(np.uint8)
            cv2.imwrite(os.path.join(out_dir, os.path.basename(path)), sr8[..., ::-1])

    if mesh is not None:
        from srganfd_tpu.parallel import batch_sharding, replicated_sharding

        ndata = mesh.shape.get("data", 1)
        if batch % ndata:
            raise SystemExit(
                f"--data-shard: --batch {batch} not divisible by the "
                f"{ndata}-device data axis"
            )
        params = jax.device_put(params, replicated_sharding(mesh))
        bsh = batch_sharding(mesh)

    frames = 0
    for shape, group in sorted(by_shape.items()):
        pending = None  # (device result, paths) submitted but not fetched
        for start in range(0, len(group), batch):
            chunk = group[start : start + batch]
            imgs = [load_image_rgb(p) for p in chunk]
            while len(imgs) < batch:  # pad tail: no second compile
                imgs.append(imgs[-1])
            x = jnp.asarray(np.stack(imgs))
            if mesh is not None:
                x = jax.device_put(x, bsh)
            sr = apply_fn(params, x)[: len(chunk)]  # async dispatch
            if pending is not None:
                write_results(*pending)
            pending = (sr, chunk)
            frames += len(chunk)
        if pending is not None:
            write_results(*pending)
    return {"frames": frames, "buckets": len(by_shape)}


def _maybe_ensemble(run_one, img: np.ndarray, enabled: bool) -> np.ndarray:
    """Run ``run_one`` directly or wrapped in the x8 self-ensemble."""
    if not enabled:
        return np.asarray(run_one(img))
    from srganfd_tpu.ops.self_ensemble import self_ensemble

    return self_ensemble(run_one, img)


def _family_ema_decay(arch: str) -> tuple[float, bool]:
    """(EMA decay, ema_reference_semantics) of the config family that
    trains ``arch`` (the ESRGAN families use 0.99998, whose EMA warms up
    50x slower than 0.999 — a hardcoded default would silently skip the
    young-EMA warning exactly where it matters most; reference-semantics
    EMAs are never young, so the flag must travel with the decay or the
    warning misfires). Falls back to (0.999, False) for unknown archs."""
    from srganfd_tpu import configs

    for name in configs._KNOWN:
        try:
            cfg = configs.get_config(name)
        except Exception:  # noqa: BLE001 — a config needing env vars etc.
            continue
        if cfg.g_arch == arch:
            return float(cfg.model_ema_decay), bool(
                getattr(cfg, "ema_reference_semantics", False)
            )
    return 0.999, False


def main() -> None:
    ap = argparse.ArgumentParser(description="srganfd_tpu single-image inference")
    ap.add_argument("--model-arch", "--model_arch_name", dest="arch", default="rrdbnet_x4")
    ap.add_argument("--inputs-path", "--inputs_path", dest="inputs", required=True)
    ap.add_argument("--output-path", "--output_path", dest="output", required=True)
    ap.add_argument("--weights", "--model_weights_path", dest="weights", default="")
    ap.add_argument("--use-ema", action="store_true", help="evaluate the EMA generator instead of the raw one")
    ap.add_argument("--device-type", "--device_type", dest="device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--tile", type=int, default=0, help="tile size for large-image tiled SR (0 = whole image)")
    ap.add_argument(
        "--batch", type=int, default=8,
        help="frames per dispatch when --inputs-path is a directory (sequence mode)",
    )
    ap.add_argument("--tile-overlap", type=int, default=16)
    ap.add_argument(
        "--data-shard",
        action="store_true",
        help="sequence mode: shard each frame batch over the data mesh axis "
        "(multi-chip serving throughput; --batch must divide by the device count)",
    )
    ap.add_argument(
        "--spatial-shard",
        action="store_true",
        help="shard the image's H axis over all devices with ICI halo "
        "exchange; transformer archs (bsrgantrans) switch their bottleneck "
        "to ring attention so tokens still attend to the whole frame",
    )
    ap.add_argument(
        "--half",
        action="store_true",
        help="bfloat16 compute (TPU analog of the reference's --half fp16; "
        "slow on CPU where bf16 is software-emulated)",
    )
    ap.add_argument(
        "--attn-chunk",
        type=int,
        default=0,
        help="attention-bearing archs (bsrgantrans, *_sa): exact chunked "
        "attention with O(chunk*T) score memory — large frames the "
        "reference's O(T^2) attention cannot process",
    )
    ap.add_argument(
        "--quant-int8",
        action="store_true",
        help="int8 post-training quantization of the RDB trunk (~95%% of "
        "generator FLOPs): s8xs8->s32 convs run at 2x the bf16 MXU MAC "
        "rate; per-output-channel weight + dynamic per-tensor activation "
        "scales (ops/quant.py). Serving-only; measure the PSNR delta on "
        "your data before shipping",
    )
    ap.add_argument(
        "--self-ensemble",
        action="store_true",
        help="x8 geometric self-ensemble (4 rotations x flip, averaged "
        "after inverse mapping): ~0.1-0.3 dB PSNR for 8x serving FLOPs; "
        "composes with --tile / --spatial-shard / sequence mode",
    )
    ap.add_argument(
        "--attn-backend",
        choices=["chunked", "flash"],
        default="chunked",
        help="execution backend for --attn-chunk attention: 'chunked' "
        "(XLA query-block sweep) or 'flash' (Pallas online-softmax "
        "kernel, scores stay in VMEM; TPU-optimized)",
    )
    ap.add_argument(
        "--cp-backend", choices=["ring", "ulysses"], default="ring",
        help="--spatial-shard transformer attention collective: ring "
        "(ppermute K/V, any device count, streamed O(T_loc*T_glob) "
        "scores) or ulysses (head-sharded all-to-all, capped at the "
        "4-head count; materializes full O(T_glob^2) per-head scores — "
        "prefer ring on very large frames)",
    )
    args = ap.parse_args()

    choice_device(args.device)
    if args.attn_backend != "chunked":
        from srganfd_tpu.models.blocks import set_attention_backend

        set_attention_backend(args.attn_backend)
    kwargs = {}
    if args.half:
        kwargs["dtype"] = jnp.bfloat16
    if args.quant_int8:
        from srganfd_tpu.models.registry import arch_accepts

        if arch_accepts(args.arch, "quant"):
            kwargs["quant"] = True
        else:
            print(f"! --quant-int8 ignored: arch {args.arch!r} has no RDB trunk")
    if args.attn_chunk:
        from srganfd_tpu.models.registry import arch_accepts

        if arch_accepts(args.arch, "attn_chunk"):
            kwargs["attn_chunk"] = args.attn_chunk
        else:
            print(
                f"! --attn-chunk ignored: arch {args.arch!r} has no "
                "attention to chunk"
            )
    model = create_model(args.arch, **kwargs)

    sequence_dir = os.path.isdir(args.inputs)
    if sequence_dir:
        from srganfd_tpu.data.datasets import list_image_files

        frame_paths = list_image_files(args.inputs)
        if not frame_paths:
            raise SystemExit(f"no images found in {args.inputs}")
        img = load_image_rgb(frame_paths[0])
    else:
        img = load_image_rgb(args.inputs)
    x = jnp.asarray(img)[None]

    if args.weights:
        payload = ckpt.load_checkpoint(args.weights)
        key = "ema_g_params" if args.use_ema else "g_params"
        if args.use_ema:
            decay, ref_semantics = _family_ema_decay(args.arch)
            ckpt.warn_if_young_ema(payload, decay, ref_semantics)
        params = payload["state"][key]
    else:
        print("! no --weights given: using randomly initialized parameters")
        params = model.init(jax.random.PRNGKey(0), x)["params"]

    apply_fn = jax.jit(lambda p, z: model.apply({"params": p}, z))

    if sequence_dir:
        import time

        if args.self_ensemble:
            # each frame becomes two batch-4 dispatches (one per dihedral
            # orientation); frame-level batching is superseded
            from srganfd_tpu.ops.self_ensemble import self_ensemble_batched

            import cv2

            os.makedirs(args.output, exist_ok=True)
            t0 = time.perf_counter()
            for p in frame_paths:
                sr = self_ensemble_batched(apply_fn, params, load_image_rgb(p))
                sr8 = np.clip(sr * 255.0, 0, 255).astype(np.uint8)
                cv2.imwrite(os.path.join(args.output, os.path.basename(p)), sr8[..., ::-1])
            dt = time.perf_counter() - t0
            print(
                f"SR'd {len(frame_paths)} frames (x8 self-ensemble) to "
                f"{args.output} in {dt:.1f}s ({len(frame_paths) / dt:.2f} frames/s)"
            )
            return
        t0 = time.perf_counter()
        seq_mesh = None
        if args.data_shard:
            from srganfd_tpu.parallel import make_mesh

            seq_mesh = make_mesh()
        stats = run_sequence(
            apply_fn, params, frame_paths, args.output, batch=args.batch, mesh=seq_mesh
        )
        dt = time.perf_counter() - t0
        print(
            f"SR'd {stats['frames']} frames ({stats['buckets']} shape bucket(s)) "
            f"to {args.output} in {dt:.1f}s ({stats['frames'] / dt:.2f} frames/s)"
        )
        return
    if args.spatial_shard:
        from srganfd_tpu.models.registry import arch_accepts
        from srganfd_tpu.parallel import make_mesh
        from srganfd_tpu.parallel.spatial import spatial_sharded_sr

        upscale = apply_fn(params, jnp.zeros((1, 8, 8, 3))).shape[1] // 8
        mesh = make_mesh()

        halo, row_multiple, shard_model = args.tile_overlap, 1, model
        if arch_accepts(args.arch, "ring_axis"):
            # transformer bottleneck: per-shard attention would only see
            # local tokens — rebuild with ring attention over the mesh so
            # every token attends to the WHOLE frame exactly (cp); halo
            # must be even for the stride-2 token grid
            halo += halo % 2
            row_multiple = 2
            shard_model = create_model(
                args.arch, ring_axis="data", ring_halo=halo,
                cp_backend=args.cp_backend, **kwargs
            )

        def run_one(im):
            return spatial_sharded_sr(
                lambda p, z: shard_model.apply({"params": p}, z),
                params, im, upscale, mesh, halo=halo,
                row_multiple=row_multiple,
            )

        sr = _maybe_ensemble(run_one, img, args.self_ensemble)
    elif args.tile:
        from srganfd_tpu.parallel.tiled_inference import tiled_sr

        upscale = apply_fn(params, jnp.zeros((1, 8, 8, 3))).shape[1] // 8

        def run_one(im):
            return tiled_sr(
                apply_fn, params, im, upscale, tile=args.tile, overlap=args.tile_overlap
            )

        sr = _maybe_ensemble(run_one, img, args.self_ensemble)
    elif args.self_ensemble:
        from srganfd_tpu.ops.self_ensemble import self_ensemble_batched

        sr = self_ensemble_batched(apply_fn, params, img)
    else:
        sr = np.asarray(apply_fn(params, x))[0]
    sr8 = np.clip(sr * 255.0, 0, 255).astype(np.uint8)

    import cv2

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    cv2.imwrite(args.output, sr8[..., ::-1])
    print(f"SR image saved to {args.output} ({sr8.shape[1]}x{sr8.shape[0]})")


if __name__ == "__main__":
    main()
