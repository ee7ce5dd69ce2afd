"""BSRGAN degradation chain, TPU-native.

Parity target: ``degradation_process`` (``BSRGAN/imgproc.py:492-562``) as
shipped in this fork — ops 2/3/4 (the two extra downsamplers and Gaussian
noise) are disabled by ``continue``, leaving:

  [optional 1/2 pre-downscale when sf==4, p=scale2_prob]
  -> shuffled {blur, blur, maybe-JPEG(p=jpeg_prob)}
  -> final JPEG (always)
  -> final MATLAB bicubic 1/sf

plus ``degradation_process_plus`` (``BSRGAN/imgproc.py:565-623``), the
11-op variant (USM, blur/resize/gauss/poisson/speckle/JPEG x2 rounds).

Design: the reference runs this per-sample on CPU inside DataLoader
workers (SURVEY.md §3.1 hot spot). Here all *random decisions* are sampled
on the host per batch (cheap numpy), packed into a static-shaped
``BsrganPlan``, and the *image math* runs on-device as one jitted program:
batched depthwise blur, DiffJPEG with per-sample quality + apply mask, and
the gather+einsum MATLAB bicubic.

Faithfulness deviations (documented, distribution-preserving):
- The two blur slots commute (linear convolution), so only the JPEG
  position within the 3-op shuffle matters. By DEFAULT the slot is
  sampled per sample exactly like the reference's per-sample shuffle
  (``per_sample_order=True``; three masked DiffJPEG applications).
  ``per_sample_order=False`` is an opt-out speed mode that samples one
  slot per *batch* (one DiffJPEG application — saves ~0.8 ms of a 66 ms
  hardware step, docs/tpu_performance.md).
- JPEG quantization uses DiffJPEG rather than cv2's entropy-coded codec
  (same transform/quantization; no entropy coding, which is lossless).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from srganfd_tpu.ops import filters, kernels
from srganfd_tpu.ops.jpeg import diff_jpeg
from srganfd_tpu.ops.resize import cv2_style_resize, imresize

__all__ = [
    "BsrganPlan",
    "plan_bsrgan_batch",
    "apply_bsrgan_batch",
    "bsrgan_degradation",
    "plan_bsrgan_plus",
    "apply_bsrgan_plus",
    "bsrgan_degradation_plus",
]

_KPAD = 25  # max BSRGAN kernel size (2*11+3)


@dataclasses.dataclass(frozen=True)
class BsrganPlan:
    """Static-shaped per-batch degradation plan (host-sampled randomness)."""

    kernels_a: np.ndarray  # (N, 25, 25)
    kernels_b: np.ndarray  # (N, 25, 25)
    jpeg_quality: np.ndarray  # (N,) mid-chain quality
    jpeg_apply: np.ndarray  # (N,) float mask {0,1}
    jpeg_pos: int | np.ndarray  # slot of the mid JPEG: int (per batch) or (N,) per sample
    final_jpeg_quality: np.ndarray  # (N,)
    scale2: bool  # per-batch 1/2 pre-downscale (sf==4 only)
    scale2_interp: int  # 0 = MATLAB bicubic, else cv2 flag 1/2/3
    effective_upscale: int
    # the raw sampled blur decisions behind kernels_a/kernels_b (two
    # tuples of sample_bsrgan_blur_params dicts), kept for distributional
    # verification (tests/test_plan_distributions.py)
    blur_params: tuple = ()


def plan_bsrgan_batch(
    rng: np.random.Generator,
    batch_size: int,
    upscale_factor: int,
    jpeg_prob: float = 0.9,
    scale2_prob: float = 0.25,
    per_sample_order: bool = True,
    **_unused,
) -> BsrganPlan:
    """Sample all chain randomness for one batch (host side).

    ``per_sample_order=True`` (default) samples the mid-JPEG's slot
    position per sample like the reference's per-sample shuffle;
    ``False`` is the opt-out speed mode (one slot per batch, one DiffJPEG
    application instead of 3 masked ones)."""
    scale2 = bool(upscale_factor == 4 and rng.random() < scale2_prob)
    scale2_interp = int(rng.choice([1, 2, 3])) if (scale2 and rng.random() < 0.5) else 0
    # the reference rebinds upscale_factor to 2 after the pre-downscale
    # (``BSRGAN/imgproc.py:511``) BEFORE the shuffle runs, so ``_add_blur``'s
    # width parameters wd/wd2 scale with the EFFECTIVE factor — sampling
    # kernels at the original factor would blur pre-halved batches ~17%
    # too wide (caught by tests/test_plan_distributions.py)
    effective = 2 if scale2 else upscale_factor
    pa = tuple(kernels.sample_bsrgan_blur_params(rng, effective) for _ in range(batch_size))
    pb = tuple(kernels.sample_bsrgan_blur_params(rng, effective) for _ in range(batch_size))
    ka = np.stack(
        [kernels.pad_kernel(kernels.build_bsrgan_blur_kernel(p), _KPAD) for p in pa]
    ).astype(np.float32)
    kb = np.stack(
        [kernels.pad_kernel(kernels.build_bsrgan_blur_kernel(p), _KPAD) for p in pb]
    ).astype(np.float32)
    return BsrganPlan(
        kernels_a=ka,
        kernels_b=kb,
        jpeg_quality=rng.integers(30, 96, size=batch_size).astype(np.float32),
        jpeg_apply=(rng.random(batch_size) < jpeg_prob).astype(np.float32),
        jpeg_pos=(
            rng.integers(0, 3, size=batch_size).astype(np.int32)
            if per_sample_order
            else int(rng.integers(0, 3))
        ),
        final_jpeg_quality=rng.integers(30, 96, size=batch_size).astype(np.float32),
        scale2=scale2,
        scale2_interp=scale2_interp,
        effective_upscale=effective,
        blur_params=(pa, pb),
    )


def _pad16(x: jax.Array) -> tuple[jax.Array, int, int]:
    h, w = x.shape[1], x.shape[2]
    ph = (-h) % 16
    pw = (-w) % 16
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
    return x, h, w


def _masked_jpeg(x: jax.Array, quality: jax.Array, mask: jax.Array | None) -> jax.Array:
    padded, h, w = _pad16(x)
    out = diff_jpeg(padded, quality, differentiable=False)[:, :h, :w, :]
    if mask is None:
        return out
    m = mask[:, None, None, None]
    return m * out + (1.0 - m) * x


@functools.partial(
    jax.jit,
    static_argnames=("jpeg_pos", "per_sample_order", "scale2", "scale2_interp", "effective_upscale"),
)
def _apply_chain(
    images: jax.Array,
    kernels_a: jax.Array,
    kernels_b: jax.Array,
    jpeg_quality: jax.Array,
    jpeg_apply: jax.Array,
    final_jpeg_quality: jax.Array,
    jpeg_pos_arr: jax.Array,
    jpeg_pos: int,
    per_sample_order: bool,
    scale2: bool,
    scale2_interp: int,
    effective_upscale: int,
) -> jax.Array:
    x = images.astype(jnp.float32)
    if np.issubdtype(np.dtype(images.dtype), np.integer):
        x = x / 255.0  # uint8 transport: normalization folded on-device
    if scale2:
        h, w = x.shape[1], x.shape[2]
        if scale2_interp == 0:
            x = imresize(x, 0.5)
        else:
            x = cv2_style_resize(x, (int(0.5 * h), int(0.5 * w)), scale2_interp)
        x = jnp.clip(x, 0.0, 1.0)

    if not per_sample_order:
        # per-batch slot: one DiffJPEG application
        if jpeg_pos == 0:
            x = _masked_jpeg(x, jpeg_quality, jpeg_apply)
        x = filters.filter2d(x, kernels_a)
        if jpeg_pos == 1:
            x = _masked_jpeg(x, jpeg_quality, jpeg_apply)
        x = filters.filter2d(x, kernels_b)
        if jpeg_pos == 2:
            x = _masked_jpeg(x, jpeg_quality, jpeg_apply)
    else:
        # per-sample slot (reference's per-sample shuffle): masked DiffJPEG
        # at every slot, selected per sample
        pos = jpeg_pos_arr
        x = _masked_jpeg(x, jpeg_quality, jpeg_apply * (pos == 0))
        x = filters.filter2d(x, kernels_a)
        x = _masked_jpeg(x, jpeg_quality, jpeg_apply * (pos == 1))
        x = filters.filter2d(x, kernels_b)
        x = _masked_jpeg(x, jpeg_quality, jpeg_apply * (pos == 2))

    # final JPEG, always (``BSRGAN/imgproc.py:558``). Sentinel: a
    # non-positive final quality skips the stage per sample — used by the
    # forced-decision chain goldens to compare the JPEG-free chain against
    # the executed reference exactly (tests/test_chain_goldens.py).
    x = _masked_jpeg(
        x,
        jnp.maximum(final_jpeg_quality, 1.0),
        (final_jpeg_quality > 0.0).astype(x.dtype),
    )
    x = imresize(x, 1.0 / effective_upscale)
    return x


def _cv2_jpeg(img_rgb: np.ndarray, quality: int) -> np.ndarray:
    """Byte-exact twin of the reference's entropy-coded JPEG round trip
    (``BSRGAN/imgproc.py:284-293`` minus its internal quality draw — the
    plan carries the sampled quality): round to uint8, RGB->BGR,
    cv2.imencode/.imdecode at ``quality``, /255, BGR->RGB."""
    import cv2

    u8 = np.uint8((img_rgb.clip(0, 1) * 255.0).round())
    bgr = cv2.cvtColor(u8, cv2.COLOR_RGB2BGR)
    _, enc = cv2.imencode(".jpg", bgr, [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)])
    dec = cv2.imdecode(enc, 1)
    return cv2.cvtColor(np.float32(dec) / 255.0, cv2.COLOR_BGR2RGB)


def _apply_chain_cv2(images, plan: BsrganPlan) -> np.ndarray:
    """Host-side chain with cv2's ENTROPY-CODED JPEG at every JPEG stage —
    the eval/test_degradations opt-in (``codec="cv2"``) that makes
    "Valid"-mode LR generation byte-exact against the reference
    (``BSRGAN/dataset.py`` Valid mode -> ``degradation_process``,
    ``BSRGAN/imgproc.py:492-562``), where the jit-friendly DiffJPEG
    default matches only to a quantization envelope (PARITY.md deviation
    2, now train-path-only). Stage order and the non-JPEG math are the
    SAME device programs as ``_apply_chain``; only the JPEG stages run on
    host through cv2. Eval has no jit constraint, so the host round trips
    cost nothing that matters."""
    # writable copies throughout: jpeg_slot assigns per-sample in place,
    # and np.asarray over jax/np.load buffers is read-only
    x = np.array(images, np.float32)
    if np.issubdtype(np.asarray(images).dtype, np.integer):
        x = x / 255.0
    if plan.scale2:
        h, w = x.shape[1], x.shape[2]
        if plan.scale2_interp == 0:
            x = np.array(imresize(jnp.asarray(x), 0.5))
        else:
            x = np.array(
                cv2_style_resize(jnp.asarray(x), (int(0.5 * h), int(0.5 * w)), plan.scale2_interp)
            )
        x = np.clip(x, 0.0, 1.0)

    per_sample = not isinstance(plan.jpeg_pos, int)
    pos = np.asarray(plan.jpeg_pos)
    app = np.asarray(plan.jpeg_apply)
    q = np.asarray(plan.jpeg_quality)

    def jpeg_slot(x: np.ndarray, slot: int) -> np.ndarray:
        for i in range(x.shape[0]):
            here = pos[i] == slot if per_sample else slot == int(plan.jpeg_pos)
            if app[i] and here:
                x[i] = _cv2_jpeg(x[i], q[i])
        return x

    x = jpeg_slot(x, 0)
    x = np.array(filters.filter2d(jnp.asarray(x), jnp.asarray(plan.kernels_a)))
    x = jpeg_slot(x, 1)
    x = np.array(filters.filter2d(jnp.asarray(x), jnp.asarray(plan.kernels_b)))
    x = jpeg_slot(x, 2)
    fq = np.asarray(plan.final_jpeg_quality)
    for i in range(x.shape[0]):
        if fq[i] > 0:  # same skip sentinel as _apply_chain
            x[i] = _cv2_jpeg(x[i], fq[i])
    return np.asarray(imresize(jnp.asarray(x), 1.0 / plan.effective_upscale))


def apply_bsrgan_batch(
    images: jax.Array, plan: BsrganPlan, codec: str = "diffjpeg"
) -> jax.Array:
    """Run the chain on-device. images: (N, H, W, 3) RGB [0,1].

    Output spatial size: ceil(H' / effective_upscale) where H' is H (or H/2
    after the pre-downscale) — identical to the reference's final
    ``image_resize(image, 1/sf)``.

    ``codec="cv2"`` (eval paths only) swaps every JPEG stage for the
    reference's entropy-coded cv2 round trip on host — byte-exact vs the
    executed reference; the default DiffJPEG stays the jittable
    train-path codec.
    """
    if codec == "cv2":
        return jnp.asarray(_apply_chain_cv2(images, plan))
    if codec != "diffjpeg":
        raise ValueError(f"unknown codec {codec!r}: expected 'diffjpeg' or 'cv2'")
    per_sample = not isinstance(plan.jpeg_pos, int)
    pos_arr = (
        jnp.asarray(plan.jpeg_pos)
        if per_sample
        else jnp.zeros((images.shape[0],), jnp.int32)
    )
    return _apply_chain(
        images,
        jnp.asarray(plan.kernels_a),
        jnp.asarray(plan.kernels_b),
        jnp.asarray(plan.jpeg_quality),
        jnp.asarray(plan.jpeg_apply),
        jnp.asarray(plan.final_jpeg_quality),
        pos_arr,
        plan.jpeg_pos if not per_sample else 0,
        per_sample,
        plan.scale2,
        plan.scale2_interp,
        plan.effective_upscale,
    )


def bsrgan_lr_size(h: int, plan: BsrganPlan) -> int:
    """Host-side prediction of the chain's LR edge for an H-px square GT
    (mirrors ``_apply_chain``'s sizes: optional pre-halve — ceil for the
    MATLAB-imresize branch, floor ``int(0.5*h)`` for the cv2 branch — then
    1/effective_upscale MATLAB resize with ceil rounding)."""
    hp = h
    if plan.scale2:
        hp = (h + 1) // 2 if plan.scale2_interp == 0 else h // 2
    return -(-hp // plan.effective_upscale)


@functools.partial(
    jax.jit,
    static_argnames=(
        "jpeg_pos",
        "per_sample_order",
        "scale2",
        "scale2_interp",
        "effective_upscale",
        "gt_size",
        "crop_upscale",
    ),
)
def _apply_chain_cropped(
    images,
    kernels_a,
    kernels_b,
    jpeg_quality,
    jpeg_apply,
    final_jpeg_quality,
    jpeg_pos_arr,
    tops,
    lefts,
    jpeg_pos,
    per_sample_order,
    scale2,
    scale2_interp,
    effective_upscale,
    gt_size,
    crop_upscale,
):
    from srganfd_tpu.ops import augment

    gt = images.astype(jnp.float32)
    if np.issubdtype(np.dtype(images.dtype), np.integer):
        gt = gt / 255.0  # uint8 transport: normalization folded on-device
    lr = _apply_chain(
        gt,
        kernels_a,
        kernels_b,
        jpeg_quality,
        jpeg_apply,
        final_jpeg_quality,
        jpeg_pos_arr,
        jpeg_pos,
        per_sample_order,
        scale2,
        scale2_interp,
        effective_upscale,
    )
    return augment.paired_random_crop(gt, lr, tops, lefts, gt_size, crop_upscale)


def apply_bsrgan_batch_cropped(
    images,
    plan: BsrganPlan,
    tops: np.ndarray,
    lefts: np.ndarray,
    gt_size: int,
    upscale_factor: int,
) -> tuple[jax.Array, jax.Array]:
    """Chain + aligned (gt, lr) random crop as ONE jitted program.

    One device dispatch instead of three (H2D + chain + crop): through a
    remote-execution tunnel each dispatch costs host CPU that starves the
    data-loader threads on few-core hosts (tools/pipeline_profile.py).
    ``tops``/``lefts`` are (N,) LR-space offsets in
    ``[0, bsrgan_lr_size(H, plan) - gt_size // upscale_factor]``.
    """
    per_sample = not isinstance(plan.jpeg_pos, int)
    pos_arr = (
        jnp.asarray(plan.jpeg_pos)
        if per_sample
        else jnp.zeros((np.shape(images)[0],), jnp.int32)
    )
    return _apply_chain_cropped(
        images,
        jnp.asarray(plan.kernels_a),
        jnp.asarray(plan.kernels_b),
        jnp.asarray(plan.jpeg_quality),
        jnp.asarray(plan.jpeg_apply),
        jnp.asarray(plan.final_jpeg_quality),
        pos_arr,
        jnp.asarray(tops),
        jnp.asarray(lefts),
        plan.jpeg_pos if not per_sample else 0,
        per_sample,
        plan.scale2,
        plan.scale2_interp,
        plan.effective_upscale,
        gt_size,
        upscale_factor,
    )


def bsrgan_degradation(
    images: jax.Array,
    rng: np.random.Generator,
    upscale_factor: int,
    **params,
) -> jax.Array:
    """Convenience wrapper: plan + apply in one call."""
    plan = plan_bsrgan_batch(rng, images.shape[0], upscale_factor, **params)
    return apply_bsrgan_batch(images, plan)


def plan_bsrgan_plus(
    rng: np.random.Generator,
    batch_size: int,
    hw: tuple[int, int],
    upscale_factor: int,
    use_sharp: bool = True,
    shuffle_prob: float = 0.1,
    poisson_prob: float = 0.1,
    speckle_prob: float = 0.1,
) -> dict:
    """Sample every random decision of ``degradation_process_plus``
    (``BSRGAN/imgproc.py:565-623``) into a host-side plan.

    Decisions, in the reference's walk order: full-vs-local shuffle of
    the 11 op slots; per slot — blur kernel params
    (:func:`sample_bsrgan_blur_params` per sample), ``_add_resize``'s
    up/down/keep branch + scale + interp (target sizes planned by
    tracking the image shape through the order, snapped to /8), additive
    Gaussian level/branch (+ correlated covariance), Poisson gate + shot
    level 10**(2U+2) + gray gate, speckle gate + level/branch, JPEG
    qualities; then the final resize interp + JPEG quality. Every slot
    produces one ops entry (skipped gates -> ``("noop",)``) so the
    device key stream in :func:`apply_bsrgan_plus` splits once per slot
    like the reference walk."""
    n = batch_size
    h, w = hw
    full_shuffle = bool(rng.random() < shuffle_prob)
    if full_shuffle:
        order = [int(i) for i in rng.permutation(11)]
    else:
        order = list(range(11))
        order[2:5] = [int(i) for i in rng.permutation(order[2:5])]
        order[7:11] = [int(i) for i in rng.permutation(order[7:11])]

    def noise_branch():
        # branch probs (BSRGAN/imgproc.py:229-244, 263-280): color 0.4 /
        # gray 0.4 / channel-correlated 0.2
        sigma = rng.integers(2, 26, size=n).astype(np.float32) / 255.0
        r = rng.random(n)
        gray = (r < 0.4).astype(np.float32)
        corr = (r > 0.8).astype(np.float32)
        chol = sample_correlated_noise_chol(rng, n)
        return sigma, gray, corr, chol

    ops: list[tuple] = []
    ch, cw = h, w
    for i in order:
        if i in (0, 6):
            # kernels built at plan time through the same public sampler
            # the base chain uses (its parameter distributions are pinned
            # by tests/test_plan_distributions.py)
            ops.append((
                "blur",
                np.stack(
                    [kernels.pad_kernel(
                        kernels.bsrgan_random_blur_kernel(rng, upscale_factor), _KPAD
                    ) for _ in range(n)]
                ).astype(np.float32),
            ))
        elif i in (1, 7):
            # _add_resize (BSRGAN/imgproc.py:314-328): up U(1,2) p=0.2,
            # down U(0.5/sf,1) p=0.7, keep p=0.1; random cv2 interp
            r = rng.random()
            if r > 0.8:
                s = float(rng.uniform(1.0, 2.0))
            elif r < 0.7:
                s = float(rng.uniform(0.5 / upscale_factor, 1.0))
            else:
                ops.append(("noop",))
                continue
            oh = max(16, int(round(s * ch / 8.0)) * 8)
            ow = max(16, int(round(s * cw / 8.0)) * 8)
            ops.append(("resize", oh, ow, int(rng.choice([1, 2, 3])), s))
            ch, cw = oh, ow
        elif i in (2, 8):
            ops.append(("gauss", *noise_branch()))
        elif i in (3, 9):
            if rng.random() < poisson_prob:
                # shot-noise level 10**(2U+2) in [100, 10^4] per sample
                # (``BSRGAN/imgproc.py:249``) — controls the SNR, so it
                # must be sampled, not fixed
                vals = (10.0 ** (2.0 * rng.random(n) + 2.0)).astype(np.float32)
                gray = (rng.random(n) < 0.5).astype(np.float32)
                ops.append(("poisson", vals, gray))
            else:
                ops.append(("noop",))
        elif i in (4, 10):
            if rng.random() < speckle_prob:
                ops.append(("speckle", *noise_branch()))
            else:
                ops.append(("noop",))
        elif i == 5:
            ops.append(("jpeg", rng.integers(30, 96, size=n).astype(np.float32)))
    return {
        "use_sharp": use_sharp,
        "full_shuffle": full_shuffle,
        "order": order,
        "ops": ops,
        "final_size": (h // upscale_factor, w // upscale_factor),
        "final_interp": int(rng.choice([1, 2, 3])),
        "final_jpeg_quality": rng.integers(30, 96, size=n).astype(np.float32),
    }


def apply_bsrgan_plus(images: jax.Array, key: jax.Array, plan: dict) -> jax.Array:
    """Run a :func:`plan_bsrgan_plus` plan on-device (one key split per
    op slot, matching the planless implementation's stream)."""
    from srganfd_tpu.ops.realesrgan_degrade import usm_sharp  # local: avoid cycle

    n = images.shape[0]
    x = images.astype(jnp.float32)
    if plan["use_sharp"]:
        x = usm_sharp(x)
    for op in plan["ops"]:
        key, sub = jax.random.split(key)
        kind = op[0]
        if kind == "noop":
            continue
        if kind == "blur":
            x = filters.filter2d(x, jnp.asarray(op[1]))
        elif kind == "resize":
            x = jnp.clip(cv2_style_resize(x, (op[1], op[2]), op[3]), 0.0, 1.0)
        elif kind == "gauss":
            x = add_gaussian_noise(
                x, sub, jnp.asarray(op[1]), jnp.asarray(op[2]),
                jnp.asarray(op[4]), jnp.asarray(op[3]),
            )
        elif kind == "poisson":
            x = add_poisson_noise(
                x, sub, jnp.ones((n,), jnp.float32), jnp.asarray(op[2]),
                vals=jnp.asarray(op[1]),
            )
        elif kind == "speckle":
            x = add_speckle_noise(
                x, sub, jnp.asarray(op[1]), jnp.asarray(op[2]),
                jnp.asarray(op[4]), jnp.asarray(op[3]),
            )
        elif kind == "jpeg":
            q = jnp.asarray(op[1])
            # quality<=0 = skip sentinel (forced-decision chain goldens)
            x = _masked_jpeg(x, jnp.maximum(q, 1.0), (q > 0).astype(x.dtype))
    x = cv2_style_resize(x, plan["final_size"], plan["final_interp"])
    q = jnp.asarray(plan["final_jpeg_quality"])
    return _masked_jpeg(jnp.clip(x, 0.0, 1.0), jnp.maximum(q, 1.0), (q > 0).astype(x.dtype))


def bsrgan_degradation_plus(
    images: jax.Array,
    rng: np.random.Generator,
    key: jax.Array,
    upscale_factor: int,
    use_sharp: bool = True,
    shuffle_prob: float = 0.1,
    poisson_prob: float = 0.1,
    speckle_prob: float = 0.1,
    **_unused,
) -> jax.Array:
    """``degradation_process_plus`` (``BSRGAN/imgproc.py:565-623``): USM
    sharpen, 11-op chain — blur/resize/gauss/poisson/speckle/JPEG over two
    rounds with local (or full, p=shuffle_prob) shuffling — then final
    resize to 1/sf + JPEG. Plan + apply in one call.

    Op order is sampled per batch (the reference samples per sample; the
    chain is order-shuffled noise whose aggregate distribution this
    preserves — same deviation as the base chain, documented above).
    Resizes inside the chain use the reference's random scales snapped to
    multiples of 8 so the program count stays bounded.
    """
    n, h, w, _ = images.shape
    plan = plan_bsrgan_plus(
        rng, n, (h, w), upscale_factor, use_sharp=use_sharp,
        shuffle_prob=shuffle_prob, poisson_prob=poisson_prob,
        speckle_prob=speckle_prob,
    )
    return apply_bsrgan_plus(images, key, plan)


# ---------------------------------------------------------------------------
# Noise primitives shared with degradation_process_plus / Real-ESRGAN
# (parity: BSRGAN/imgproc.py:229-280, Real_ESRGAN/imgproc.py:832-1089).
# ---------------------------------------------------------------------------


def add_gaussian_noise(
    x: jax.Array,
    key: jax.Array,
    sigma: jax.Array,
    gray_mask: jax.Array,
    corr_chol: jax.Array | None = None,
    corr_mask: jax.Array | None = None,
) -> jax.Array:
    """Per-sample Gaussian noise; ``sigma`` (N,) in [0,1] units,
    ``gray_mask`` (N,) 1.0 => single-channel noise broadcast over RGB.

    ``corr_chol`` (N,3,3) + ``corr_mask`` (N,): the reference's third
    branch (``BSRGAN/imgproc.py:235-240``) draws channel-correlated noise
    N(0, L^2 |U^T D U|); the host samples that covariance's Cholesky
    factor per image and the device applies it (sigma is ignored for
    correlated samples, as in the reference)."""
    n, h, w, c = x.shape
    k1, k2 = jax.random.split(key)
    color = jax.random.normal(k1, (n, h, w, c), x.dtype)
    gray = jax.random.normal(k2, (n, h, w, 1), x.dtype)
    noise = jnp.where(gray_mask[:, None, None, None] > 0.5, gray, color)
    noise = noise * sigma[:, None, None, None]
    if corr_chol is not None and corr_mask is not None:
        corr = jnp.einsum("nhwc,ndc->nhwd", color, corr_chol.astype(x.dtype))
        noise = jnp.where(corr_mask[:, None, None, None] > 0.5, corr, noise)
    return jnp.clip(x + noise, 0.0, 1.0)


def sample_correlated_noise_chol(
    rng: np.random.Generator, batch_size: int, noise_level2: int = 25
) -> np.ndarray:
    """Host sampler for the correlated-color covariance
    (``BSRGAN/imgproc.py:235-240``): cov = |L^2 U^T D U| with D random
    diagonal and U a random orthogonal matrix; returns Cholesky factors
    (N, 3, 3)."""
    import scipy.linalg

    L = noise_level2 / 255.0
    out = np.zeros((batch_size, 3, 3), np.float32)
    for i in range(batch_size):
        d = np.diag(rng.random(3))
        u = scipy.linalg.orth(rng.random((3, 3)))
        cov = np.abs(L**2 * (u.T @ d @ u))
        # |.| can break positive-definiteness; factor via clipped
        # eigendecomposition (numpy's multivariate_normal is similarly
        # SVD-tolerant of the reference's non-PSD covariances)
        vals, vecs = np.linalg.eigh(cov)
        out[i] = (vecs * np.sqrt(np.clip(vals, 0.0, None))).astype(np.float32)
    return out


_POW2 = np.asarray([1, 2, 4, 8, 16, 32, 64, 128, 256], np.float32)


def poisson_noise_vals(rounded: jax.Array) -> jax.Array:
    """The torch reference's per-sample shot-noise level
    (``Real_ESRGAN/imgproc.py:894-897,905-908``):
    ``2**ceil(log2(#unique values))`` of the 8-bit-rounded image. The
    unique count of a [0,1] image rounded to 255ths is exactly the
    number of occupied 256-level histogram bins — a fixed-size, jittable
    reduction (the reference's per-sample ``torch.unique`` loop is not).
    The power-of-two lookup is integer-exact (a table search, no f32
    log2/exp2 transcendentals whose TPU approximations could tip an
    exact power over the ceil boundary and double vals). Typical natural
    content occupies ~all levels -> vals ~ 256; a fixed approximation
    (e.g. 1000) would understate the noise ~2x."""
    levels = jnp.clip(jnp.round(rounded * 255.0), 0, 255).astype(jnp.int32)
    hist = jax.vmap(lambda l: jnp.bincount(l.reshape(-1), length=256))(levels)
    nuniq = jnp.maximum((hist > 0).sum(-1), 1)
    powers = jnp.asarray(_POW2)
    idx = jnp.searchsorted(powers.astype(jnp.int32), nuniq, side="left")
    return powers[idx].astype(rounded.dtype)


def add_poisson_noise(
    x: jax.Array,
    key: jax.Array,
    scale: jax.Array,
    gray_mask: jax.Array,
    vals: jax.Array | None = None,
) -> jax.Array:
    """Poisson (shot) noise with each reference's exact construction.

    ``vals=None`` — the TORCH reference's semantics
    (``Real_ESRGAN/imgproc.py:869-919``): per-sample content-derived
    levels ``2**ceil(log2(#unique))`` computed separately for the color
    and gray sources; the gray source is torchvision ``rgb_to_grayscale``
    (luma 0.2989/0.587/0.114) of the UNROUNDED image, rounded after; the
    output adds the noise to the unrounded input.

    ``vals`` given (N,) — the NUMPY reference's semantics used by the
    BSRGAN plus chain (``BSRGAN/imgproc.py:246-259``): the image is
    8-bit-rounded FIRST (the rounded image is the output base), the gray
    source is ``np.dot(rounded, [0.299, 0.587, 0.114])`` of that rounded
    image, and one level (the chain's 10**(2U+2) draw) serves both
    branches."""
    k1, k2 = jax.random.split(key)
    rounded = jnp.clip(jnp.round(x * 255.0), 0, 255) / 255.0
    if vals is None:
        luma = jnp.asarray([0.2989, 0.587, 0.114], x.dtype)
        gray = jnp.sum(x * luma, axis=-1, keepdims=True)
        gray_src = jnp.clip(jnp.round(gray * 255.0), 0, 255) / 255.0
        v_color = poisson_noise_vals(rounded)[:, None, None, None]
        v_gray = poisson_noise_vals(gray_src)[:, None, None, None]
        base = x
    else:
        luma = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
        gray_src = jnp.clip(
            jnp.round(jnp.sum(rounded * luma, axis=-1, keepdims=True) * 255.0), 0, 255
        ) / 255.0
        v_color = v_gray = vals[:, None, None, None]
        base = rounded
    noisy = jax.random.poisson(k1, rounded * v_color, x.shape).astype(x.dtype) / v_color
    noise_color = noisy - rounded
    noisy_gray = (
        jax.random.poisson(k2, gray_src * v_gray, gray_src.shape).astype(x.dtype) / v_gray
    )
    noise_gray = jnp.broadcast_to(noisy_gray - gray_src, x.shape)
    noise = jnp.where(gray_mask[:, None, None, None] > 0.5, noise_gray, noise_color)
    return jnp.clip(base + noise * scale[:, None, None, None], 0.0, 1.0)


def add_speckle_noise(
    x: jax.Array,
    key: jax.Array,
    sigma: jax.Array,
    gray_mask: jax.Array,
    corr_chol: jax.Array | None = None,
    corr_mask: jax.Array | None = None,
) -> jax.Array:
    """Multiplicative Gaussian noise (``BSRGAN/imgproc.py:263-280``).

    Same three branches as the additive form: gray / color / channel-
    correlated (``corr_chol`` (N,3,3) + ``corr_mask`` (N,), as in
    :func:`add_gaussian_noise`); the noise multiplies the clipped image."""
    n, h, w, c = x.shape
    k1, k2 = jax.random.split(key)
    color = jax.random.normal(k1, (n, h, w, c), x.dtype)
    gray = jax.random.normal(k2, (n, h, w, 1), x.dtype)
    noise = jnp.where(gray_mask[:, None, None, None] > 0.5, gray, color)
    noise = noise * sigma[:, None, None, None]
    if corr_chol is not None and corr_mask is not None:
        corr = jnp.einsum("nhwc,ndc->nhwd", color, corr_chol.astype(x.dtype))
        noise = jnp.where(corr_mask[:, None, None, None] > 0.5, corr, noise)
    xc = jnp.clip(x, 0.0, 1.0)
    return jnp.clip(xc + xc * noise, 0.0, 1.0)
