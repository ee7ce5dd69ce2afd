"""Chain-level forced-decision goldens vs the EXECUTED reference chains.

tools/gen_chain_goldens.py ran the reference's composed
``degradation_process`` (``BSRGAN/imgproc.py:492-562``) with scripted
random decisions and recorded the blur kernels, JPEG slots/qualities and
size branches. Here the IDENTICAL decisions replay through our fused XLA
program (``ops/degrade.py``) and the outputs must agree:

- ``*_exact_nojpeg`` scenarios (final JPEG bypassed on the reference
  side, quality<=0 sentinel on ours): the surviving chain — optional
  pre-downscale, two mirror blurs, final MATLAB bicubic — is codec-free
  and must match to float roundoff (<=1e-5);
- JPEG scenarios: full-chain agreement within the documented
  DiffJPEG-vs-cv2 envelope (quantization-exact, entropy-coding-free;
  see PARITY.md and tests/test_degradation_ops.py).
"""

import pathlib

import numpy as np
import pytest

import jax.numpy as jnp

from srganfd_tpu.ops.degrade import BsrganPlan, apply_bsrgan_batch, bsrgan_lr_size
from srganfd_tpu.ops.kernels import pad_kernel

GOLDEN = pathlib.Path(__file__).parent / "goldens" / "chain_bsrgan_process.npz"


def _scenarios():
    data = np.load(GOLDEN)
    names = sorted({k.split("/")[0] for k in data.files if "/" in k})
    return data, names


@pytest.mark.parametrize("name", _scenarios()[1])
def test_bsrgan_process_chain_matches_executed_reference(name):
    data = np.load(GOLDEN)
    image = data["input"]
    meta = data[f"{name}/meta"]
    sf, scale2, interp, jpeg_pos, mid_fires, mid_q, final_q = (int(v) for v in meta)

    plan = BsrganPlan(
        kernels_a=pad_kernel(data[f"{name}/kernel_a"].astype(np.float32), 25)[None],
        kernels_b=pad_kernel(data[f"{name}/kernel_b"].astype(np.float32), 25)[None],
        jpeg_quality=np.array([mid_q if mid_fires else 50.0], np.float32),
        jpeg_apply=np.array([float(mid_fires)], np.float32),
        jpeg_pos=jpeg_pos,
        # quality<=0 = skip sentinel for the reference-side bypassed runs
        final_jpeg_quality=np.array([float(final_q) if final_q else 0.0], np.float32),
        scale2=bool(scale2),
        scale2_interp=interp,
        effective_upscale=2 if scale2 else sf,
    )
    got = np.asarray(apply_bsrgan_batch(jnp.asarray(image[None]), plan))[0]
    want = data[f"{name}/lr"]
    assert got.shape == want.shape, f"{name}: {got.shape} vs {want.shape}"
    assert got.shape[0] == bsrgan_lr_size(image.shape[0], plan)
    err = float(np.max(np.abs(got - want)))
    if name.endswith("_exact_nojpeg"):
        assert err <= 1e-5, f"{name}: codec-free chain diverged by {err}"
    else:
        assert err < 0.02, f"{name}: JPEG chain outside the DiffJPEG envelope ({err})"


GOLDEN_PLUS = pathlib.Path(__file__).parent / "goldens" / "chain_bsrgan_plus.npz"


class _ScriptedNpRng:
    """np.random.Generator stand-in that feeds ``bsrgan_degradation_plus``
    the same forced decisions the reference run consumed (queues in
    execution order); real seeded randomness for array draws whose values
    cannot affect the output (e.g. the correlated-noise covariance, which
    is masked off in the zero-noise scenarios)."""

    def __init__(self, scalars, ints, uniforms, choices, perms):
        self.scalars, self.ints = list(scalars), list(ints)
        self.uniforms, self.choices = list(uniforms), list(choices)
        self.perms = [np.asarray(p) for p in perms]
        self._real = np.random.default_rng(0)

    def random(self, size=None):
        if size is None:
            return self.scalars.pop(0)
        if size in (1, (1,)):
            return np.full(1, self.scalars.pop(0))
        return self._real.random(size)

    def integers(self, lo, hi, size=None):
        v = self.ints.pop(0)
        return np.full(size, v, np.int64) if size is not None else v

    def uniform(self, a, b):
        return self.uniforms.pop(0)

    def choice(self, seq):
        return self.choices.pop(0)

    def permutation(self, x):
        return self.perms.pop(0)

    def done(self):
        return not (self.scalars or self.ints or self.uniforms or self.choices or self.perms)


def _plus_scenarios():
    data = np.load(GOLDEN_PLUS)
    return sorted({k.split("/")[0] for k in data.files if "/" in k})


@pytest.mark.parametrize("name", _plus_scenarios())
def test_bsrgan_plus_chain_matches_executed_reference(name, monkeypatch):
    import jax

    from srganfd_tpu.ops import degrade

    data = np.load(GOLDEN_PLUS)
    image = data["input"]
    sf, full_shuffle, jpeg_on, i1, i2, i_final = (int(v) for v in data[f"{name}/meta"])
    exec_order = [int(v) for v in data[f"{name}/exec_order"]]
    s1, s2 = (float(v) for v in data[f"{name}/resize_scales"])

    # build the scripted queues in the chain's consumption order
    scalars = [0.1 if full_shuffle else 0.9]
    ints, kq = [], []
    for i in exec_order:
        if i in (1, 7):
            scalars.append(0.5)  # down-branch draw
        elif i in (2, 8):
            scalars.append(0.5)  # gaussian branch draw (no gray, no corr)
            ints.append(0)  # sigma = 0: the zero-noise limit
        elif i in (3, 4, 9, 10):
            scalars.append(0.9)  # >= poisson/speckle prob: skip
        elif i == 5:
            ints.append(66 if jpeg_on else -1)  # -1 = skip sentinel
        elif i in (0, 6):
            kq.append(("kernel_a", "kernel_b")[len(kq)])
    ints.append(88 if jpeg_on else -1)  # final JPEG
    rng = _ScriptedNpRng(
        scalars, ints, uniforms=[s1, s2], choices=[i1, i2, i_final],
        perms=[exec_order] if full_shuffle else [[2, 3, 4], [7, 8, 9, 10]],
    )
    kernel_queue = [data[f"{name}/{k}"].astype(np.float32) for k in kq]
    monkeypatch.setattr(
        degrade.kernels, "bsrgan_random_blur_kernel",
        lambda _rng, _sf: kernel_queue.pop(0),
    )

    got = np.asarray(
        degrade.bsrgan_degradation_plus(
            jnp.asarray(image[None]), rng, jax.random.PRNGKey(0), sf,
            use_sharp=True, shuffle_prob=0.5, poisson_prob=0.5, speckle_prob=0.5,
        )
    )[0]
    assert rng.done() and not kernel_queue, f"{name}: unconsumed scripted decisions"
    want = data[f"{name}/lr"]
    assert got.shape == want.shape, f"{name}: {got.shape} vs {want.shape}"
    err = float(np.max(np.abs(got - want)))
    if name.endswith("_exact"):
        # codec-free; USM carries the separable-blur 2e-5 golden envelope
        assert err <= 5e-5, f"{name}: zero-noise chain diverged by {err}"
    else:
        # TWO serial codec stages (mid + final JPEG) with blur/resize in
        # between: the per-stage <0.02 DiffJPEG envelope compounds, so the
        # worst pixel is bounded at 2x with the mean held tight
        mean_err = float(np.mean(np.abs(got - want)))
        # measured: ~0.003 mean per codec stage at these qualities; the
        # structurally identical *_exact scenario pins the composition
        assert err < 0.04 and mean_err < 1e-2, (
            f"{name}: JPEG chain outside the compounded DiffJPEG envelope "
            f"(max {err}, mean {mean_err})"
        )


GOLDEN_RE = pathlib.Path(__file__).parent / "goldens" / "chain_realesrgan.npz"


def _re_scenarios():
    data = np.load(GOLDEN_RE)
    return sorted({k.split("/")[0] for k in data.files if "/" in k})


@pytest.mark.parametrize("name", _re_scenarios())
def test_realesrgan_chain_matches_executed_reference(name):
    """The second-order chain (``Real_ESRGAN/imgproc.py:2323-2462``) with
    identical kernels (chain inputs) and forced decisions. Noise ran at
    its zero-noise limit BY PARAMETER on the reference side
    (noise_range=(0,0)); our plan scripts sigma=0. Exact scenarios bypass
    both JPEG stages (identity module / quality<=0 sentinel), so blur,
    all three resizes (incl. the scale-factor vs size arithmetic and the
    stage-2 branch order), the sinc filter and the final 8-bit
    quantization must agree to float roundoff. The jpeg scenario runs our
    production DiffJPEG (standard table layout) against the reference's
    module (transposed tables — its documented defect, PARITY.md), so it
    carries that envelope."""
    import jax

    from srganfd_tpu.ops.realesrgan_degrade import RealEsrganPlan, apply_realesrgan_batch

    data = np.load(GOLDEN_RE)
    image = data["input"]
    sf, size1, i1, size2, i2, i_final, second_blur, jpeg_first, jpeg_on = (
        int(v) for v in data[f"{name}/meta"]
    )
    q1, q2 = (float(v) for v in data[f"{name}/jpeg_q"])
    n = 1
    zeros = np.zeros(n, np.float32)
    plan = RealEsrganPlan(
        size1=(size1, size1),
        interp1=i1,
        size2=(size2, size2),
        interp2=i2,
        final_size=(image.shape[0] // sf, image.shape[1] // sf),
        final_interp=i_final,
        second_blur=bool(second_blur),
        jpeg_first_in_stage2=bool(jpeg_first),
        noise1_sigma=zeros,
        noise1_poisson_scale=np.ones(n, np.float32),
        noise1_is_poisson=zeros,
        noise1_gray=zeros,
        jpeg1_quality=np.array([q1 if jpeg_on else -1.0], np.float32),
        noise2_sigma=zeros,
        noise2_poisson_scale=np.ones(n, np.float32),
        noise2_is_poisson=zeros,
        noise2_gray=zeros,
        jpeg2_quality=np.array([q2 if jpeg_on else -1.0], np.float32),
    )
    got = np.asarray(
        apply_realesrgan_batch(
            jnp.asarray(image[None]),
            jnp.asarray(data["k1"][None]),
            jnp.asarray(data["k2"][None]),
            jnp.asarray(data["sinc"][None]),
            jax.random.PRNGKey(0),
            plan,
        )
    )[0]
    want = data[f"{name}/lr"]
    assert got.shape == want.shape, f"{name}: {got.shape} vs {want.shape}"
    err = float(np.max(np.abs(got - want)))
    if name.endswith("_exact"):
        # the chain ends in round(x*255)/255: ~1e-7 float roundoff can
        # flip a value sitting on a .5 level boundary by one 8-bit level,
        # so the max is bounded at one level with the population tight
        frac_off = float(np.mean(np.abs(got - want) > 1e-5))
        assert err <= 1.0 / 255.0 + 1e-5 and frac_off < 0.01, (
            f"{name}: zero-noise chain diverged (max {err}, {frac_off:.2%} "
            f"of pixels off a quantization level)"
        )
    else:
        mean_err = float(np.mean(np.abs(got - want)))
        assert err < 0.05 and mean_err < 1e-2, (
            f"{name}: outside the standard-vs-transposed-table DiffJPEG "
            f"envelope (max {err}, mean {mean_err})"
        )


@pytest.mark.parametrize("name", _scenarios()[1])
def test_bsrgan_chain_cv2_codec_matches_reference_exactly(name):
    """codec="cv2" (the eval-path opt-in) swaps DiffJPEG for the
    reference's entropy-coded cv2 round trip — the SAME executed-reference
    goldens must now match to float roundoff on every scenario, JPEG ones
    included (PARITY deviation 2 rescoped to train-path-only)."""
    data = np.load(GOLDEN)
    image = data["input"]
    meta = data[f"{name}/meta"]
    sf, scale2, interp, jpeg_pos, mid_fires, mid_q, final_q = (int(v) for v in meta)

    plan = BsrganPlan(
        kernels_a=pad_kernel(data[f"{name}/kernel_a"].astype(np.float32), 25)[None],
        kernels_b=pad_kernel(data[f"{name}/kernel_b"].astype(np.float32), 25)[None],
        jpeg_quality=np.array([mid_q if mid_fires else 50.0], np.float32),
        jpeg_apply=np.array([float(mid_fires)], np.float32),
        jpeg_pos=jpeg_pos,
        final_jpeg_quality=np.array([float(final_q) if final_q else 0.0], np.float32),
        scale2=bool(scale2),
        scale2_interp=interp,
        effective_upscale=2 if scale2 else sf,
    )
    got = np.asarray(apply_bsrgan_batch(jnp.asarray(image[None]), plan, codec="cv2"))[0]
    want = data[f"{name}/lr"]
    assert got.shape == want.shape
    err = float(np.max(np.abs(got - want)))
    assert err <= 1e-5, f"{name}: cv2-codec chain diverged by {err}"
