"""Native C++ loader: decode parity with cv2 and batch production."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from srganfd_tpu.data import native_loader


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_imgs")
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 256, (90, 110, 3)).astype(np.uint8)
        cv2.imwrite(str(d / f"a{i}.png"), img)
        cv2.imwrite(str(d / f"b{i}.jpg"), img, [int(cv2.IMWRITE_JPEG_QUALITY), 95])
    return str(d)


@pytest.fixture(scope="module")
def lib_available():
    if not native_loader.available():
        pytest.skip("native loader not built (needs g++ + libjpeg/libpng)")


def test_png_decode_matches_cv2(image_dir, lib_available):
    path = os.path.join(image_dir, "a0.png")
    got = native_loader.decode_image_native(path)
    want = cv2.imread(path)[..., ::-1].astype(np.float32) / 255.0
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_jpeg_decode_close_to_cv2(image_dir, lib_available):
    path = os.path.join(image_dir, "b0.jpg")
    got = native_loader.decode_image_native(path)
    want = cv2.imread(path)[..., ::-1].astype(np.float32) / 255.0
    assert got.shape == want.shape
    # different IDCT implementations may differ by a few LSBs
    assert np.abs(got - want).max() < 0.05
    assert np.abs(got - want).mean() < 0.005


def test_batch_production(image_dir, lib_available):
    paths = sorted(
        os.path.join(image_dir, f) for f in os.listdir(image_dir) if f.endswith(".png")
    )
    ld = native_loader.NativeBatchLoader(paths, crop=48, batch_size=3, seed=1, num_threads=2)
    it = iter(ld)
    b1 = next(it)
    b2 = next(it)
    assert b1["gt"].shape == (3, 48, 48, 3)
    assert b1["gt"].dtype == np.float32
    assert 0.0 <= b1["gt"].min() and b1["gt"].max() <= 1.0
    assert not np.array_equal(b1["gt"], b2["gt"])
    ld.close()


def test_uint8_batches_match_float_batches(image_dir, lib_available):
    """uint8 transport must be the same pixels as the float path (x255)."""
    import glob

    paths = sorted(glob.glob(os.path.join(image_dir, "*.png")))
    kw = dict(crop=48, batch_size=2, seed=7, num_threads=1, train=True)
    a = iter(native_loader.NativeBatchLoader(paths, **kw))
    b = iter(native_loader.NativeBatchLoader(paths, uint8=True, **kw))
    for _ in range(3):
        fa = next(a)["gt"]
        fb = next(b)["gt"]
        assert fb.dtype == np.uint8
        np.testing.assert_allclose(fa, fb.astype(np.float32) / 255.0, atol=1e-6)


def test_stale_or_corrupt_so_falls_back_gracefully(tmp_path, monkeypatch):
    """ADVICE r1 (medium): a stale/unloadable .so must make available()
    return False (Python BatchLoader fallback), not raise."""
    import ctypes
    import pathlib
    import shutil
    import subprocess

    # Corrupt file: CDLL raises OSError -> unavailable, no exception.
    bad = tmp_path / "libsrganfd_loader.so"
    bad.write_bytes(b"not an elf")
    monkeypatch.setattr(native_loader, "_LIB_PATH", pathlib.Path(bad))
    monkeypatch.setattr(native_loader, "_lib", None)
    assert native_loader._load(build_if_missing=False) is None

    # Stale .so missing loader_create2: AttributeError path -> unavailable.
    if shutil.which("g++"):
        src = tmp_path / "stale.cc"
        src.write_text(
            'extern "C" { void* loader_create(const char**, int, int, int,'
            " unsigned long long, int, int) { return 0; } }\n"
        )
        stale = tmp_path / "stale_loader.so"
        subprocess.run(
            ["g++", "-shared", "-fPIC", "-o", str(stale), str(src)], check=True
        )
        lib = ctypes.CDLL(str(stale))
        monkeypatch.setattr(native_loader, "_LIB_PATH", pathlib.Path(stale))
        monkeypatch.setattr(native_loader, "_lib", None)
        assert native_loader._load(build_if_missing=False) is None
        del lib


def test_legacy_loader_create_delegates(image_dir, lib_available):
    """The old ABI entry must produce real batches (not nullptr segfaults)."""
    import ctypes

    lib = native_loader._load()
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = native_loader._lib.loader_create3.argtypes[:-2]
    paths = sorted(
        os.path.join(image_dir, f) for f in os.listdir(image_dir) if f.endswith(".png")
    )
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    handle = lib.loader_create(arr, len(paths), 32, 2, 0, 1, 1)
    assert handle
    buf = np.empty((2, 32, 32, 3), np.float32)
    assert lib.loader_next(handle, buf.ctypes.data_as(ctypes.c_void_p)) == 1
    assert 0.0 <= buf.min() and buf.max() <= 1.0
    lib.loader_destroy(handle)
    # nullptr handle is a clean miss, not a segfault
    assert lib.loader_next(None, buf.ctypes.data_as(ctypes.c_void_p)) == 0


def _collect(paths, n, **kw):
    ld = native_loader.NativeBatchLoader(paths, crop=32, batch_size=2, **kw)
    it = iter(ld)
    out = [next(it)["gt"].copy() for _ in range(n)]
    ld.close()
    return out


def test_emission_order_is_thread_count_invariant(image_dir, lib_available):
    """Batches must come out in batch-id order regardless of how many
    workers race: the stream is a pure function of (seed, start batch)."""
    paths = sorted(
        os.path.join(image_dir, f) for f in os.listdir(image_dir) if f.endswith(".png")
    )
    a = _collect(paths, 6, seed=5, num_threads=1)
    b = _collect(paths, 6, seed=5, num_threads=4)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_start_batch_seeks_the_stream(image_dir, lib_available):
    """start_batch=k must yield byte-identical batches to skipping k."""
    paths = sorted(
        os.path.join(image_dir, f) for f in os.listdir(image_dir) if f.endswith(".png")
    )
    full = _collect(paths, 6, seed=9, num_threads=3)
    sought = _collect(paths, 3, seed=9, num_threads=3, start_batch=3)
    for x, y in zip(full[3:], sought):
        np.testing.assert_array_equal(x, y)


def test_fused_crop_uint8_matches_float():
    """apply_bsrgan_batch_cropped over uint8 == over f32/255 bit-for-bit."""
    from srganfd_tpu.ops.degrade import apply_bsrgan_batch_cropped, plan_bsrgan_batch

    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    plan = plan_bsrgan_batch(rng, 2, 4)
    tops = np.array([1, 2])
    lefts = np.array([0, 3])
    gt_u, lr_u = apply_bsrgan_batch_cropped(raw, plan, tops, lefts, 32, 4)
    gt_f, lr_f = apply_bsrgan_batch_cropped(
        raw.astype(np.float32) / 255.0, plan, tops, lefts, 32, 4
    )
    np.testing.assert_allclose(np.asarray(gt_u), np.asarray(gt_f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lr_u), np.asarray(lr_f), atol=1e-6)
