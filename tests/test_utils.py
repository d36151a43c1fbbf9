"""Tests for IO + RNG utilities."""
import numpy as np
import pytest

from photon_tpu.utils.nrrd_io import read_nrrd, write_nrrd
from photon_tpu.utils.rng import GlibcRand, reference_lens_samples
from photon_tpu.utils.tiff_io import read_tiff16, write_tiff16


def test_glibc_rand_reference_sequence():
    # expected values from glibc rand() with srand(10), verified against a
    # compiled C program (same seed the reference host runtime uses,
    # ref: parallel_ray_tracing.cu:3228)
    expected = [1215069295, 1311962008, 1086128678, 385788725,
                1753820418, 394002377, 1255532675, 906573271]
    g = GlibcRand(10)
    assert [g.next_int() for _ in range(8)] == expected


def test_reference_lens_samples_interleaved():
    r1, r2 = reference_lens_samples(3, seed=10)
    g = GlibcRand(10)
    flat = g.uniform(6)
    np.testing.assert_allclose(r1, flat[0::2].astype(np.float32))
    np.testing.assert_allclose(r2, flat[1::2].astype(np.float32))
    assert ((r1 >= 0) & (r1 <= 1)).all()


def test_nrrd_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.random((5, 6, 7)).astype(np.float32)
    path = str(tmp_path / "vol.nrrd")
    write_nrrd(path, vol, spacings=[1.5, 2.0, 2.5], space_origin=[-1, 0, 3])
    data, hdr = read_nrrd(path)
    np.testing.assert_array_equal(data, vol)
    np.testing.assert_allclose(hdr["spacings"], [1.5, 2.0, 2.5])
    np.testing.assert_allclose(hdr["space origin"], [-1, 0, 3])
    assert list(hdr["sizes"]) == [5, 6, 7]


def test_nrrd_reads_reference_sample():
    import os
    path = "/root/reference/sample-data/bos/sample-density.nrrd"
    if not os.path.exists(path):
        pytest.skip("reference sample volume not present")
    data, hdr = read_nrrd(path)
    assert data.shape == tuple(hdr["sizes"])
    assert data.ndim == 3
    assert np.isfinite(data).all()
    # plausibly air-like densities (kg/m^3)
    assert 0.0 < data.mean() < 10.0


def test_tiff_roundtrip(tmp_path):
    img = (np.arange(12, dtype=np.uint16) * 1000).reshape(3, 4)
    path = str(tmp_path / "img.tif")
    write_tiff16(path, img)
    out = read_tiff16(path)
    np.testing.assert_array_equal(out, img)
