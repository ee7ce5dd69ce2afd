"""Cut the thesis's published 640x480 CFD result frames into 320px tiles
for the round-5 convergence run, split by SCENE (not by tile) so the
validation frames share no content with training.

Source: /root/reference/Results/allResults/* (8 model-output dirs x 5
scenes = 40 frames). Valid scene: every variant of one scene goes to
valid/; everything else to train/. Stride chosen for ~45 tiles/frame.
"""
import glob, os, sys
import cv2

SRC = "/root/reference/Results/allResults"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/thesis_tiles"
VALID_SCENE = "310519_a6_3_0030"
TILE, TRAIN_STRIDE, VALID_STRIDE = 320, 40, 160

for split in ("train", "valid"):
    os.makedirs(os.path.join(OUT, split), exist_ok=True)

n = {"train": 0, "valid": 0}
for f in sorted(glob.glob(os.path.join(SRC, "*", "*.jpg"))):
    scene = os.path.splitext(os.path.basename(f))[0]
    model = os.path.basename(os.path.dirname(f))
    split = "valid" if scene == VALID_SCENE else "train"
    stride = VALID_STRIDE if split == "valid" else TRAIN_STRIDE
    im = cv2.imread(f, cv2.IMREAD_COLOR)
    h, w = im.shape[:2]
    for top in range(0, h - TILE + 1, stride):
        for left in range(0, w - TILE + 1, stride):
            out = os.path.join(OUT, split, f"{model}_{scene}_{top:04d}_{left:04d}.png")
            cv2.imwrite(out, im[top:top + TILE, left:left + TILE])
            n[split] += 1
print(n)
