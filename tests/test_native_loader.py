"""Native C++ data loader vs PIL parity (decode, resample, crop, flip)."""

import numpy as np
import pytest
from PIL import Image

from madm_tpu.data import native


@pytest.fixture(scope="module")
def png_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
    p = str(d / "t.png")
    Image.fromarray(arr).save(p)
    return p, arr


@pytest.fixture(scope="module")
def label_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("lbls")
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 20, (60, 80), dtype=np.uint8)
    arr[0, :] = 255
    p = str(d / "l.png")
    Image.fromarray(arr).save(p)
    return p, arr


needs_native = pytest.mark.skipif(
    not native.available(), reason="native loader toolchain unavailable"
)


@needs_native
def test_decode_exact(png_path):
    p, arr = png_path
    out = native.load(p)
    np.testing.assert_array_equal(out, arr)


@needs_native
def test_resize_bilinear_matches_pil(png_path):
    p, arr = png_path
    out = native.load(p, resize_wh=(40, 32))
    ref = np.array(Image.fromarray(arr).resize((40, 32), Image.BILINEAR))
    diff = np.abs(out.astype(int) - ref.astype(int))
    # PIL uses int fixed-point filter coefficients, we use double: results
    # agree to 1 LSB (rounding ties land differently on ~15% of pixels)
    assert diff.max() <= 1, f"max diff {diff.max()}"


@needs_native
def test_resize_upscale_matches_pil(png_path):
    p, arr = png_path
    out = native.load(p, resize_wh=(160, 120))
    ref = np.array(Image.fromarray(arr).resize((160, 120), Image.BILINEAR))
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1


@needs_native
def test_nearest_label_matches_pil(label_path):
    p, arr = label_path
    out = native.load(p, resize_wh=(40, 32), nearest=True, out_c=1)[..., 0]
    ref = np.array(Image.fromarray(arr).resize((40, 32), Image.NEAREST))
    np.testing.assert_array_equal(out, ref)


@needs_native
def test_crop_flip_matches_pil(png_path):
    p, arr = png_path
    out = native.load(p, resize_wh=(80, 60), crop=(10, 5, 32, 24), flip=True)
    img = Image.fromarray(arr).resize((80, 60), Image.BILINEAR)
    img = img.crop((10, 5, 42, 29)).transpose(Image.FLIP_LEFT_RIGHT)
    ref = np.array(img)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


@needs_native
def test_gray_replicates_to_rgb(label_path):
    p, arr = label_path
    out = native.load(p, out_c=3)
    assert out.shape == (60, 80, 3)
    np.testing.assert_array_equal(out[..., 0], out[..., 2])
