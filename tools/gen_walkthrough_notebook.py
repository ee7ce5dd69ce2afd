"""Generate docs/pipeline_walkthrough.ipynb — the interactive twin of
``docs/run_pipeline_walkthrough.py``.

The reference ships its workflow as a notebook
(``/root/reference/ESRGAN/ESRGANpipeline.ipynb`` cells 3-10: LR
generation -> split -> train -> mlflow ui -> test). This produces the
srganfd_tpu equivalent as a real, executable .ipynb so notebook users
get the same surface. Regenerate after editing:

    python tools/gen_walkthrough_notebook.py

Execute headlessly (from the repo root, CPU, a few minutes):

    PALLAS_AXON_POOL_IPS= jupyter nbconvert --to notebook --execute \
        docs/pipeline_walkthrough.ipynb --output /tmp/walkthrough_out.ipynb

tests/test_notebook.py runs it with nbclient on every suite pass.
"""

from __future__ import annotations

import pathlib

import nbformat as nbf

nb = nbf.v4.new_notebook()
cells = []


def md(text: str) -> None:
    cells.append(nbf.v4.new_markdown_cell(text))


def code(src: str) -> None:
    cells.append(nbf.v4.new_code_cell(src.strip("\n")))


md(
    """\
# srganfd_tpu pipeline walkthrough

The end-to-end super-resolution workflow of the reference's
`ESRGAN/ESRGANpipeline.ipynb`, on this framework: synthesize CFD-like
frames, generate LR images (reference cell 3), split the dataset
(cell 5), train (cell 7), inspect the tracked metrics (the `mlflow ui`
analog of cell 8), evaluate (cell 10), and run single-image inference
— all through the library's real CLI surfaces.

Runs on CPU in a few minutes with tiny models. On a TPU VM remove the
`JAX_PLATFORMS` override in the first cell and scale the model/config
up (see `srganfd_tpu/configs/`). Sizes come from environment variables
so the test suite can shrink them (`SRGANFD_NB_FRAMES`,
`SRGANFD_NB_STEPS`, `SRGANFD_NB_WORKDIR`)."""
)

code(
    """
# Environment bootstrap — must run before jax is imported anywhere.
import os, sys, pathlib

os.environ["PALLAS_AXON_POOL_IPS"] = ""   # keep any TPU-tunnel hook off
os.environ["JAX_PLATFORMS"] = "cpu"        # delete this line on a real TPU VM

root = os.environ.get("SRGANFD_REPO_ROOT", "")
if not root:  # find the repo root from wherever the kernel started
    for cand in [pathlib.Path.cwd(), *pathlib.Path.cwd().parents]:
        if (cand / "srganfd_tpu").is_dir():
            root = str(cand)
            break
assert root, "run from inside the srganfd_tpu repository (or set SRGANFD_REPO_ROOT)"
sys.path.insert(0, root)

FRAMES = int(os.environ.get("SRGANFD_NB_FRAMES", 10))
STEPS = int(os.environ.get("SRGANFD_NB_STEPS", 4))
WORK = pathlib.Path(os.environ.get("SRGANFD_NB_WORKDIR", "walkthrough_out")).resolve()

import shutil
if WORK.exists():
    shutil.rmtree(WORK)
(WORK / "raw").mkdir(parents=True)
os.chdir(WORK)
print("workdir:", WORK)
"""
)

md(
    """\
## 0. Synthesize CFD-like frames

The thesis trains on "Bubbles" CFD frames. With no dataset in this
environment we synthesize lookalikes: smooth low-frequency flow plus
bright circular bubbles."""
)

code(
    """
import cv2
import numpy as np

rng = np.random.default_rng(0)
for i in range(FRAMES):
    base = rng.uniform(0, 1, (12, 12, 3))
    img = cv2.resize(base, (192, 192), interpolation=cv2.INTER_CUBIC)
    yy, xx = np.mgrid[0:192, 0:192]
    for _ in range(6):
        cy, cx = rng.integers(20, 172, 2).tolist()
        r = int(rng.integers(5, 18))
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        img[mask] = img[mask] * 0.3 + 0.7
    cv2.imwrite(f"raw/frame{i:03d}.png", (np.clip(img, 0, 1) * 255).astype(np.uint8))
print(f"wrote {FRAMES} frames to raw/")
"""
)

md(
    """\
## 1. Create LR images (reference notebook cell 3)

The reference's cell 3 loops `cv2.resize(image, None, fx=1/4, fy=1/4,
interpolation=cv2.INTER_CUBIC)` over the GT directory. Identical here."""
)

code(
    """
os.makedirs("rawLR", exist_ok=True)
for name in sorted(os.listdir("raw")):
    image = cv2.imread(f"raw/{name}", cv2.IMREAD_UNCHANGED)
    lr = cv2.resize(image, None, fx=0.25, fy=0.25, interpolation=cv2.INTER_CUBIC)
    cv2.imwrite(f"rawLR/{name}", lr)
print(f"wrote {len(os.listdir('rawLR'))} LR images to rawLR/")
"""
)

md(
    """\
## 2. Split train/valid/test (reference notebook cell 5)

The reference shells out to shuffle+move files; here the same split is
a library call (`srganfd_tpu.cli.split_dataset`), seeded for
reproducibility."""
)

code(
    """
from srganfd_tpu.cli.split_dataset import split_dataset

counts = split_dataset("raw", "data", train=0.6, valid=0.2, seed=0)
counts
"""
)

md(
    """\
## 3. Train (reference notebook cell 7)

The reference's cell 7 runs `train_rrdbnet.py` then `train_esrgan.py`.
Here both phases go through `srganfd_tpu.cli.train.run_train`: an L1
RRDBNet pretrain, then a GAN leg with the thesis's BSRGAN family
(on-device degradation chain + SN U-Net discriminator). Models are tiny
so this executes in minutes on CPU; drop `g_kwargs`/`d_kwargs` for the
real sizes."""
)

code(
    """
from srganfd_tpu.cli.train import run_train
from srganfd_tpu.configs import get_config

tiny_g = {"channels": 8, "growth_channels": 4}
pre = run_train(
    get_config(
        "rrdbnet",
        train_gt_images_dir="data/train",
        valid_gt_images_dir="data/valid",
        epochs=2,
        batch_size=2,
        gt_image_size=64,
        compute_dtype="float32",
        g_kwargs={**tiny_g, "num_blocks": 1},
    ),
    steps_per_epoch=STEPS,
)
print(f"pretrain best PSNR {pre['best_psnr']:.2f} dB")
"""
)

code(
    """
gan = run_train(
    get_config(
        "bsrgan",
        train_gt_images_dir="data/train",
        valid_gt_images_dir="data/valid",
        epochs=1,
        batch_size=2,
        gt_image_size=64,
        crop_image_size=96,
        compute_dtype="float32",
        content_weight=(),  # no VGG19 npz in this image (see PARITY.md)
        g_kwargs={**tiny_g, "num_rrdb": 1},
        d_kwargs={"channels": 8},
    ),
    steps_per_epoch=STEPS,
)
print(f"GAN leg best PSNR {gan['best_psnr']:.2f} dB")
"""
)

md(
    """\
## 4. Inspect tracked metrics (the `mlflow ui` analog of cell 8)

The reference launches `mlflow ui` to browse runs. The tracker here
fans out to MLflow + TensorBoard *and* an always-on JSONL sink, so the
run history is inspectable with no server:"""
)

code(
    """
import json, glob

events = []
for path in sorted(glob.glob("samples/logs/*/events.jsonl")):
    with open(path) as fh:
        events += [json.loads(line) for line in fh]
metric_rows = [e for e in events if e.get("kind") == "metrics"]
print(f"{len(events)} tracker events across {len(glob.glob('samples/logs/*'))} runs")
for row in metric_rows[-3:]:
    print(row)
"""
)

md(
    """\
## 5. Evaluate (reference notebook cell 10)

The reference's cell 10 runs `test_esrgan.py` over the held-out split.
`srganfd_tpu.cli.test.run_eval` computes the same PSNR / SSIM / NIQE /
LPIPS averages (Y-channel conventions preserved) on the best
checkpoint."""
)

code(
    """
from argparse import Namespace

from srganfd_tpu.cli.test import run_eval

res = run_eval(Namespace(
    config="rrdbnet", gt_dir="data/test", lr_dir="",
    weights="results/train_RRDBNet_x4/ckpt_best",
    save_images=False, max_images=0, subdivision_lpips=False,
    save_discriminator_eval=False, save_attention_layers=False,
    niqe_model="", tiny=True, use_ema=False, exact_shapes=False,
))
res["avg"]
"""
)

md(
    """\
## 6. Single-image inference

`cli.infer` is the reference's `inference.py`. Upscale one LR frame and
show the pair inline."""
)

code(
    """
import sys as _sys

from srganfd_tpu.cli import infer as infer_cli

lr_path = sorted(pathlib.Path("rawLR").glob("*.png"))[0].as_posix()
_sys.argv = [
    "infer", "--model-arch", "rrdbnet_x4",
    "--inputs-path", lr_path, "--output-path", "sr.png",
]
infer_cli.main()
print("wrote sr.png")
"""
)

code(
    """
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

lr_img = cv2.imread(lr_path)[..., ::-1]
sr_img = cv2.imread("sr.png")[..., ::-1]
fig, axes = plt.subplots(1, 2, figsize=(8, 4))
axes[0].imshow(lr_img); axes[0].set_title(f"LR {lr_img.shape[:2]}")
axes[1].imshow(sr_img); axes[1].set_title(f"SR {sr_img.shape[:2]}")
for ax in axes:
    ax.axis("off")
fig.tight_layout()
print("walkthrough complete — outputs in", WORK)
"""
)

for i, cell in enumerate(cells):  # deterministic ids -> byte-stable output
    cell["id"] = f"cell-{i:02d}"
nb["cells"] = cells
nb["metadata"]["kernelspec"] = {
    "display_name": "Python 3",
    "language": "python",
    "name": "python3",
}
nb["metadata"]["language_info"] = {"name": "python"}

out = pathlib.Path(__file__).resolve().parents[1] / "docs" / "pipeline_walkthrough.ipynb"
nbf.write(nb, out)
print(f"wrote {out}")
