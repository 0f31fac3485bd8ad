"""ImageNet-style data pipeline (ImageFolder + per-family preprocessing).

Rebuild of the reference's torchvision pipeline (test_quant.py:129-158,
565-597; utils/data_utils.py:9-52) on PIL + numpy (torchvision is not in
this image). Preprocessing parity is a real accuracy risk (SURVEY §7), so
the transform reproduces torchvision semantics exactly:

  resize(shorter side = int(img_size / crop_pct), bicubic)
  → center-crop(img_size) → scale to [0,1] → normalize(mean, std)

torchvision's Resize on a PIL image calls PIL Image.resize with the same
bicubic filter, so the pixel math is identical.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".webp")


def build_transform(img_size=224, mean=(0.485, 0.456, 0.406),
                    std=(0.229, 0.224, 0.225), crop_pct=0.875,
                    interpolation=Image.BICUBIC if Image else None):
    """Returns PIL.Image -> float32 CHW ndarray (test_quant.py:565-597)."""
    size = int(img_size / crop_pct)
    mean = np.asarray(mean, dtype=np.float32).reshape(3, 1, 1)
    std = np.asarray(std, dtype=np.float32).reshape(3, 1, 1)

    def tf(img):
        img = img.convert("RGB")
        w, h = img.size
        # torchvision Resize(int): shorter side -> size, keep aspect
        if w < h:
            nw, nh = size, max(int(round(size * h / w)), size)
        else:
            nh, nw = size, max(int(round(size * w / h)), size)
        img = img.resize((nw, nh), interpolation)
        left = (nw - img_size) // 2
        top = (nh - img_size) // 2
        img = img.crop((left, top, left + img_size, top + img_size))
        arr = np.asarray(img, dtype=np.float32).transpose(2, 0, 1) / 255.0
        return (arr - mean) / std

    return tf


class ImageFolder:
    """Directory-per-class dataset (torchvision.datasets.ImageFolder layout).

    Classes are the sorted subdirectory names; targets their indices — the
    exact torchvision convention, so ImageNet val trees evaluate identically.
    """

    def __init__(self, root: str, transform=None):
        self.root = root
        self.transform = transform
        self.classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples = []
        for c in self.classes:
            cdir = os.path.join(root, c)
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith(IMG_EXTENSIONS):
                    self.samples.append((os.path.join(cdir, fname), self.class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        path, target = self.samples[i]
        img = Image.open(path)
        if self.transform:
            img = self.transform(img)
        return img, target


def iterate_batches(
    dataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = False,
) -> Iterator[tuple]:
    """Minimal host-side batch loader: yields (float32 [B,3,H,W], int64 [B]).

    Replaces the reference's DataLoader worker pool (test_quant.py:137-158);
    for TPU eval the host loop overlaps with device compute via async
    dispatch, which covers ImageNet-val preprocessing at these batch sizes.
    """
    idx = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    for start in range(0, len(idx), batch_size):
        sel = idx[start : start + batch_size]
        if drop_last and len(sel) < batch_size:
            return
        imgs, targets = zip(*(dataset[i] for i in sel))
        yield np.stack(imgs), np.asarray(targets, dtype=np.int64)
