"""Native C++ data loader: bit-exact parity with the PIL pipeline.

The loader must reproduce PIL's decode + bicubic resize + crop + normalize
EXACTLY (preprocessing parity is an accuracy risk, SURVEY §7): same libjpeg
ISLOW decode, Pillow's fixed-point separable resampling (Resample.c,
PRECISION_BITS=22), same f32 normalize association."""

import os

import numpy as np
import pytest

from PIL import Image

from p2vit_tpu import data, native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    """Images exercising the decode corners: odd sizes, grayscale JPEG,
    palette/RGBA/16-bit PNG."""
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)

    def arr(h, w, ch=3):
        return rng.randint(0, 256, (h, w, ch), dtype=np.uint8)

    cases = {}
    p = str(root / "rgb.jpg")
    Image.fromarray(arr(247, 301)).save(p, quality=92)
    cases["jpeg_rgb"] = p
    p = str(root / "gray.jpg")
    Image.fromarray(arr(180, 260, 1)[:, :, 0], mode="L").save(p, quality=85)
    cases["jpeg_gray"] = p
    p = str(root / "rgb.png")
    Image.fromarray(arr(255, 199)).save(p)
    cases["png_rgb"] = p
    p = str(root / "rgba.png")
    rgba = np.concatenate([arr(120, 160), arr(120, 160, 1)], axis=-1)
    Image.fromarray(rgba, mode="RGBA").save(p)
    cases["png_rgba"] = p
    p = str(root / "pal.png")
    Image.fromarray(arr(90, 140)).convert("P", palette=Image.ADAPTIVE).save(p)
    cases["png_palette"] = p
    return cases


def _native_decode_resize(path, nw, nh):
    import ctypes

    lib = native.load()
    out = np.empty((nh, nw, 3), dtype=np.uint8)
    rc = lib.p2vit_decode_resize(
        path.encode(), nw, nh,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    assert rc == 0, f"native decode failed for {path}"
    return out


@pytest.mark.parametrize("nw,nh", [(256, 256), (311, 97), (64, 200)])
def test_decode_resize_bit_exact_vs_pil(image_dir, nw, nh):
    for name, path in image_dir.items():
        pil = np.asarray(
            Image.open(path).convert("RGB").resize((nw, nh), Image.BICUBIC)
        )
        ours = _native_decode_resize(path, nw, nh)
        np.testing.assert_array_equal(ours, pil, err_msg=f"{name} {nw}x{nh}")


def test_identity_resize_is_identity(image_dir):
    path = image_dir["png_rgb"]
    src = np.asarray(Image.open(path).convert("RGB"))
    h, w = src.shape[:2]
    np.testing.assert_array_equal(_native_decode_resize(path, w, h), src)


def test_native_imagefolder_matches_pil_pipeline(tmp_path, image_dir):
    # build a 2-class ImageFolder from the corner-case images
    rng = np.random.RandomState(1)
    for ci, cls in enumerate(["a", "b"]):
        d = tmp_path / "val" / cls
        d.mkdir(parents=True)
        for j in range(3):
            img = rng.randint(0, 256, (230 + 7 * j, 250 - 9 * j, 3), dtype=np.uint8)
            Image.fromarray(img).save(str(d / f"{j}.jpg"), quality=90)
        # one PNG per class too
        Image.fromarray(
            rng.randint(0, 256, (200, 300, 3), dtype=np.uint8)
        ).save(str(d / "x.png"))

    kw = dict(img_size=96, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
              crop_pct=0.875)
    pil_ds = data.ImageFolder(str(tmp_path / "val"), data.build_transform(**kw))
    nat_ds = data.NativeImageFolder(str(tmp_path / "val"), **kw)
    assert [s for s, _ in nat_ds.samples] == [s for s, _ in pil_ds.samples]

    pil_batches = list(data.iterate_batches(pil_ds, 3))
    nat_batches = list(data.iterate_batches(nat_ds, 3))
    assert len(pil_batches) == len(nat_batches)
    for (pi, pt), (ni, nt) in zip(pil_batches, nat_batches):
        np.testing.assert_array_equal(pt, nt)
        np.testing.assert_array_equal(ni, pi)  # bit-exact f32


def test_native_raw_u8_matches_pil_raw(tmp_path, image_dir):
    """raw=True: native decode+resize+crop to CHW uint8 must match the PIL
    raw transform bit for bit (the u8-ingestion input, and a fallback path
    check: PIL __getitem__ must also produce raw uint8)."""
    rng = np.random.RandomState(4)
    d = tmp_path / "val" / "a"
    d.mkdir(parents=True)
    for j in range(3):
        Image.fromarray(
            rng.randint(0, 256, (210 + 5 * j, 190 + 3 * j, 3), dtype=np.uint8)
        ).save(str(d / f"{j}.jpg"), quality=90)
    Image.fromarray(
        rng.randint(0, 256, (150, 170, 3), dtype=np.uint8)
    ).save(str(d / "im.bmp"))  # exercises the PIL fallback inside raw mode

    kw = dict(img_size=96, crop_pct=0.875)
    nat_ds = data.NativeImageFolder(str(tmp_path / "val"), raw=True, **kw)
    pil_ds = data.ImageFolder(
        str(tmp_path / "val"),
        data.build_transform(img_size=96, crop_pct=0.875, raw=True),
    )
    (ni, nt), (pi, pt) = (nat_ds.load_batch(range(len(nat_ds.samples))),
                          next(data.iterate_batches(pil_ds, 8)))
    assert ni.dtype == np.uint8 and pi.dtype == np.uint8
    np.testing.assert_array_equal(nt, pt)
    np.testing.assert_array_equal(ni, pi)


def test_native_fallback_on_unsupported_format(tmp_path):
    d = tmp_path / "val" / "a"
    d.mkdir(parents=True)
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (140, 150, 3), dtype=np.uint8)
    Image.fromarray(img).save(str(d / "im.bmp"))  # not handled natively
    kw = dict(img_size=64, crop_pct=0.9)
    nat_ds = data.NativeImageFolder(str(tmp_path / "val"), **kw)
    pil_ds = data.ImageFolder(
        str(tmp_path / "val"), data.build_transform(img_size=64, crop_pct=0.9)
    )
    (ni, _), (pi, _) = (nat_ds.load_batch([0]),
                        next(data.iterate_batches(pil_ds, 1)))
    np.testing.assert_array_equal(ni, pi)


def test_prefetch_iterator_equivalence(tmp_path):
    """prefetch=N must yield the same batches in the same order, and
    propagate producer errors."""
    rng = np.random.RandomState(3)
    d = tmp_path / "val" / "a"
    d.mkdir(parents=True)
    for j in range(7):
        Image.fromarray(
            rng.randint(0, 256, (100, 120, 3), dtype=np.uint8)
        ).save(str(d / f"{j}.jpg"), quality=90)
    ds = data.ImageFolder(
        str(tmp_path / "val"), data.build_transform(img_size=64, crop_pct=0.9)
    )
    plain = list(data.iterate_batches(ds, 3, shuffle=True, seed=5))
    pref = list(data.iterate_batches(ds, 3, shuffle=True, seed=5, prefetch=2))
    assert len(plain) == len(pref)
    for (a, ta), (b, tb) in zip(plain, pref):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(ta, tb)

    class Boom:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("decode failed")

    with pytest.raises(RuntimeError, match="decode failed"):
        list(data.iterate_batches(Boom(), 2, prefetch=2))
