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
                    interpolation=Image.BICUBIC if Image else None,
                    raw=False):
    """Returns PIL.Image -> float32 CHW ndarray (test_quant.py:565-597).

    ``raw=True``: stop after resize+crop and return uint8 CHW — the input
    of the device-side u8 ingestion path (serving.attach_u8_ingest), which
    replays the /255+normalize on device bit-identically. 4x smaller
    host->device transfer and no per-image host float math."""
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
        if raw:
            return np.asarray(img, dtype=np.uint8).transpose(2, 0, 1)
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


class NativeImageFolder(ImageFolder):
    """ImageFolder whose batches decode in the native C++ thread pool.

    The native pipeline (p2vit_tpu/native/dataload.cpp) replicates the PIL
    path bit-exactly: same libjpeg ISLOW decode, Pillow's fixed-point
    bicubic resampling, the same center-crop and f32 normalize association.
    Images the native decoder can't handle (e.g. webp/bmp) fall back to the
    per-image PIL path, so results are identical either way — only faster
    (decode+resize parallelized across a std::thread pool instead of the
    Python loop; the reference used fork()ed DataLoader workers,
    /root/reference/test_quant.py:137-158).
    """

    def __init__(self, root: str, img_size=224, mean=(0.485, 0.456, 0.406),
                 std=(0.229, 0.224, 0.225), crop_pct=0.875, n_threads=0,
                 raw=False):
        # ``raw=True``: batches come back uint8 CHW (decode+resize+crop only,
        # no normalize) — the input of the device-side u8 ingestion path
        # (serving.attach_u8_ingest); pairs --native-loader with --u8-ingest
        super().__init__(
            root, transform=build_transform(img_size, mean, std, crop_pct,
                                            raw=raw)
        )
        self.img_size = img_size
        self.resize_size = int(img_size / crop_pct)
        self.mean = tuple(float(m) for m in mean)
        self.std = tuple(float(s) for s in std)
        self.n_threads = n_threads
        self.raw = raw

    def load_batch(self, indices):
        import ctypes

        from . import native

        lib = native.load()
        paths = [self.samples[int(i)][0] for i in indices]
        targets = np.asarray(
            [self.samples[int(i)][1] for i in indices], dtype=np.int64
        )
        n = len(paths)
        rc = np.zeros(n, dtype=np.int32)
        carr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        if self.raw:
            out = np.empty((n, 3, self.img_size, self.img_size),
                           dtype=np.uint8)
            failed = lib.p2vit_load_batch_u8(
                carr, n, self.resize_size, self.img_size,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                rc.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                self.n_threads,
            )
        else:
            out = np.empty((n, 3, self.img_size, self.img_size),
                           dtype=np.float32)
            mean_c = (ctypes.c_float * 3)(*self.mean)
            std_c = (ctypes.c_float * 3)(*self.std)
            failed = lib.p2vit_load_batch(
                carr, n, self.resize_size, self.img_size, mean_c, std_c,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                rc.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                self.n_threads,
            )
        if failed:
            for i in np.nonzero(rc)[0]:  # PIL fallback per failed image
                out[i] = self[int(indices[int(i)])][0]
        return out, targets


def iterate_batches(
    dataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = False,
    prefetch: int = 0,
) -> Iterator[tuple]:
    """Minimal host-side batch loader: yields (float32 [B,3,H,W], int64 [B])
    — or uint8 images when the dataset uses a raw transform (u8 ingestion).

    Replaces the reference's DataLoader worker pool (test_quant.py:137-158):
    datasets exposing ``load_batch`` (NativeImageFolder) decode each batch in
    the C++ thread pool; otherwise the per-image Python path runs.

    ``prefetch``: when > 0, batches are produced by a background thread into
    a bounded queue of that depth, so host decode overlaps the consumer's
    device step (double buffering with prefetch=1..2 hides the preprocessing
    latency behind TPU compute).
    """
    idx = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    native = hasattr(dataset, "load_batch")

    def produce():
        for start in range(0, len(idx), batch_size):
            sel = idx[start : start + batch_size]
            if drop_last and len(sel) < batch_size:
                return
            if native:
                yield dataset.load_batch(sel)
            else:
                imgs, targets = zip(*(dataset[i] for i in sel))
                yield np.stack(imgs), np.asarray(targets, dtype=np.int64)

    if prefetch <= 0:
        yield from produce()
        return

    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    _END = object()

    def worker():
        try:
            for item in produce():
                q.put(item)
            q.put(_END)
        except BaseException as e:  # surface decode errors in the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
    t.join()
