import os

import numpy as np
import pytest

from tryraytrace_tpu.io.ppm import load_ppm, save_ppm
from tryraytrace_tpu.io.snapshot import save_snapshot, tonemap_accum


def test_ppm_roundtrip(tmp_path):
    img = (np.arange(2 * 3 * 3) % 256).astype(np.uint8).reshape(2, 3, 3)
    p = tmp_path / "t.ppm"
    save_ppm(p, img)
    out = load_ppm(p)
    np.testing.assert_array_equal(out, img)


def test_save_image_suffix_dispatch(tmp_path):
    from tryraytrace_tpu.io.ppm import save_image

    img = (np.arange(2 * 3 * 3) % 256).astype(np.uint8).reshape(2, 3, 3)
    # .ppm (and unknown suffixes) -> parity P6 writer.
    p = tmp_path / "t.ppm"
    save_image(p, img)
    np.testing.assert_array_equal(load_ppm(p), img)
    # .png -> PIL round trip (beyond-reference convenience).
    g = tmp_path / "t.png"
    save_image(g, img)
    from PIL import Image

    np.testing.assert_array_equal(np.asarray(Image.open(g)), img)


def test_ppm_reference_format(tmp_path):
    # The byte layout the reference writer produces (image_io.cpp:77).
    p = tmp_path / "ref.ppm"
    with open(p, "wb") as f:
        f.write(b"P6\n2 1\n255\n")
        f.write(bytes([255, 0, 0, 0, 255, 0]))
    img = load_ppm(p)
    assert img.shape == (1, 2, 3)
    assert tuple(img[0, 0]) == (255, 0, 0)
    assert tuple(img[0, 1]) == (0, 255, 0)


def test_ppm_rejects_p3(tmp_path):
    p = tmp_path / "bad.ppm"
    p.write_bytes(b"P3\n1 1\n255\n255 0 0\n")
    with pytest.raises(ValueError):
        load_ppm(p)


def test_ppm_truncated(tmp_path):
    p = tmp_path / "short.ppm"
    p.write_bytes(b"P6\n2 2\n255\n\x00\x00\x00")
    with pytest.raises(ValueError):
        load_ppm(p)


def test_tonemap_accum_average():
    accum = np.full((2, 2, 3), 4.0, np.float32)  # avg 1.0 over 4 frames
    img = tonemap_accum(accum, 4)
    assert img.dtype == np.uint8
    assert (img == 255).all()


def test_save_snapshot_naming(tmp_path):
    accum = np.ones((4, 4, 3), np.float32)
    path = save_snapshot(accum.reshape(-1, 3), 4, 4, frame=7,
                         focus_dist=240.0, aperture=0.25,
                         out_dir=str(tmp_path))
    assert os.path.exists(path)
    base = os.path.basename(path)
    assert "_Frame7_F240.0_A0.25.ppm" in base
    img = load_ppm(path)
    assert img.shape == (4, 4, 3)


def test_pallas_tonemap_matches_host():
    import jax
    import jax.numpy as jnp

    from tryraytrace_tpu.ops.pallas_tonemap import tonemap_device

    rng = np.random.RandomState(3)
    accum = (rng.rand(333, 3) * 8).astype(np.float32)
    interpret = jax.devices()[0].platform == "cpu"
    got = np.asarray(tonemap_device(jnp.asarray(accum), jnp.int32(5),
                                    interpret=interpret))
    want = tonemap_accum(accum.reshape(333, 1, 3), 5).reshape(333, 3)
    np.testing.assert_array_equal(got, want)
