"""Native (C) image loader: build, decode, PIL-agreement, fault chain."""

import os

import numpy as np
import pytest
from PIL import Image

from d2r_tpu.data.image import load_image, preprocess_pil
from d2r_tpu.data.native_image import native_available, native_load_image


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    # non-square JPEG, bigger than target
    arr = rng.integers(0, 256, size=(300, 500, 3)).astype(np.uint8)
    jpg = str(root / "a.jpg")
    Image.fromarray(arr).save(jpg, quality=95)
    # PNG (the inf.png fallback is a PNG)
    png = str(root / "b.png")
    Image.fromarray(arr[:256, :256]).save(png)
    # corrupt file
    bad = str(root / "c.jpg")
    with open(bad, "wb") as f:
        f.write(b"garbage")
    return {"jpg": jpg, "png": png, "bad": bad}


def test_native_builds():
    assert native_available(), "C image loader failed to build"


def test_native_matches_pil_jpeg(images):
    native = native_load_image(images["jpg"], 224)
    assert native is not None and native.shape == (3, 224, 224)
    pil = preprocess_pil(Image.open(images["jpg"]).convert("RGB"), 224)
    # PIL resamples in fixed-point uint8 per pass; the C path keeps float.
    diff = np.abs(native - pil)
    assert diff.mean() < 0.02, diff.mean()
    assert np.percentile(diff, 99) < 0.08


def test_native_decodes_png(images):
    native = native_load_image(images["png"], 224)
    assert native is not None
    pil = preprocess_pil(Image.open(images["png"]).convert("RGB"), 224)
    assert np.abs(native - pil).mean() < 0.02


def test_native_rejects_corrupt_and_chain_falls_back(images):
    assert native_load_image(images["bad"], 224) is None
    # full chain: corrupt -> fallback png
    out = load_image(images["bad"], 224, fallback_path=images["png"])
    expect = load_image(images["png"], 224)
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_native_missing_file():
    assert native_load_image("/nonexistent/x.jpg", 224) is None
