"""Image-driven BOS source (C7 tail: generate_bos_image_lightfield_data)."""
import numpy as np

import jax

from tests.test_bos_pipeline import bos_case
from photon_tpu.models.optics import camera_setup
from photon_tpu.models.render_fast import render_image_fast
from photon_tpu.models.scenes import bos_image_source
from photon_tpu.utils.rng import lens_samples


def test_bos_image_source_geometry_and_render():
    cfg = bos_case("apparent", rays=8)
    setup = camera_setup(cfg)
    # a target image with two bright pixels
    img = np.zeros((50, 50), np.float32)
    img[10, 10] = 2.0
    img[40, 30] = 5.0
    src = bos_image_source(cfg, setup, img)
    assert src.num_particles == 2
    # radiance carries pixel intensity
    assert sorted(src.radiance.tolist()) == [2.0, 5.0]
    # all points on the object plane
    np.testing.assert_allclose(src.z, setup.z_object, rtol=1e-6)
    # columns mirror into x: the col=10 pixel maps farther +x than col=30
    x_by_rad = {r: x for r, x in zip(src.radiance, src.x)}
    assert x_by_rad[2.0] > x_by_rad[5.0]
    # rows descend from Y_Max: row 10 above row 40
    y_by_rad = {r: y for r, y in zip(src.radiance, src.y)}
    assert y_by_rad[2.0] > y_by_rad[5.0]

    r1, r2 = lens_samples(jax.random.key(0), 8)
    out = np.asarray(render_image_fast(cfg, setup, src, r1, r2))
    assert out.sum() > 0
    from scipy import ndimage
    assert ndimage.label(out > out.max() * 0.1)[1] == 2


# ---------------------------------------------------------------------------
# PNG-driven source (round 3: the reference's actual input format)
# ---------------------------------------------------------------------------


def _write_png(path, arr, bitdepth=8, colortype=0, filters=None):
    """Author a minimal PNG (test fixture for utils.png_io)."""
    import struct
    import zlib

    h, w = arr.shape[:2]
    nchan = {0: 1, 2: 3, 4: 2, 6: 4}[colortype]
    px = arr.reshape(h, w * nchan)
    raw = b""
    prev = np.zeros(w * nchan * (bitdepth // 8), np.uint8)
    for r in range(h):
        if bitdepth == 16:
            row16 = px[r].astype(">u2").tobytes()
            row = np.frombuffer(row16, np.uint8).copy()
        else:
            row = px[r].astype(np.uint8).copy()
        ft = 0 if filters is None else filters[r % len(filters)]
        if ft == 0:
            enc = row
        elif ft == 2:    # Up
            enc = (row.astype(np.int16) - prev).astype(np.uint8)
        else:
            raise NotImplementedError
        raw += bytes([ft]) + enc.tobytes()
        prev = row

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, colortype, 0, 0, 0)
    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(blob)


def test_png_reader_roundtrip(tmp_path):
    from photon_tpu.utils.png_io import read_png

    rng = np.random.default_rng(3)
    img8 = rng.integers(0, 255, (7, 11), dtype=np.uint8)
    p = str(tmp_path / "g8.png")
    _write_png(p, img8, filters=[0, 2])
    np.testing.assert_allclose(read_png(p), img8 / 255.0, atol=1e-7)

    img16 = rng.integers(0, 65535, (5, 6), dtype=np.uint16)
    p16 = str(tmp_path / "g16.png")
    _write_png(p16, img16, bitdepth=16)
    np.testing.assert_allclose(read_png(p16), img16 / 65535.0, atol=1e-7)

    rgba = rng.integers(0, 255, (4, 5, 4), dtype=np.uint8)
    prgba = str(tmp_path / "rgba.png")
    _write_png(prgba, rgba, colortype=6)
    np.testing.assert_allclose(read_png(prgba), rgba[..., 0] / 255.0,
                               atol=1e-7)


def test_bos_image_source_from_png_path(tmp_path):
    """A PNG dot-pattern path drives the BOS source end to end
    (ref input format, run_simulation_02.py:1620-1628)."""
    from photon_tpu.config import default_config
    from photon_tpu.models.optics import camera_setup
    from photon_tpu.models.scenes import bos_image_source

    img = np.zeros((16, 16), np.uint8)
    img[4, 5] = 200
    img[10, 12] = 100
    p = str(tmp_path / "dots.png")
    _write_png(p, img)

    cfg = default_config("bos")
    setup = camera_setup(cfg)
    src = bos_image_source(cfg, setup, p)
    assert src.num_particles == 2
    assert (src.radiance > 0).all()
