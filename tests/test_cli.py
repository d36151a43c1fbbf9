"""Batch CLI end-to-end: config authoring, job-array slicing, artifacts.

(the reference's C1 driver contract: glob parameter files, slice, run,
write tif/raw/sidecars — batch_run_simulation.py:26-118)
"""
import json
import os

import numpy as np

from photon_tpu.cli import main
from photon_tpu.utils.tiff_io import read_tiff16


def _author_case(tmp_path, name, with_volume):
    from tests.test_bos_pipeline import bos_case
    from photon_tpu.models.optics import camera_setup
    from photon_tpu.utils.nrrd_io import write_nrrd

    cfg = bos_case("general", n_dots=4, rays=8)
    cfg.camera_design.x_pixel_number = 64
    cfg.camera_design.y_pixel_number = 64
    if with_volume:
        setup = camera_setup(cfg)
        n = 12
        extent = 4e5
        x = np.linspace(-extent / 2, extent / 2, n)
        z = np.linspace(setup.object_distance * 0.4,
                        setup.object_distance * 0.9, n)
        rho = 1.225 + 4.0 * (x[:, None, None] - x.min()) \
            / (x.max() - x.min()) * np.ones((1, n, n))
        nrrd = os.path.join(tmp_path, name + ".nrrd")
        write_nrrd(nrrd, rho.astype(np.float32),
                   spacings=(x[1] - x[0], x[1] - x[0], z[1] - z[0]),
                   space_origin=(x[0], x[0], z[0]))
        cfg.density_gradients.simulate_density_gradients = True
        cfg.density_gradients.density_gradient_filename = nrrd
    path = os.path.join(tmp_path, name + ".json")
    cfg.to_json(path)
    return path


def test_cli_runs_directory_with_slicing(tmp_path):
    d = str(tmp_path)
    _author_case(d, "case_a", with_volume=True)
    _author_case(d, "case_b", with_volume=False)
    out = os.path.join(d, "out")

    # job-array slice: only the first case (start 0, count 1)
    rc = main([d, "0", "1", "--out", out])
    assert rc == 0
    tifs = sorted(os.listdir(os.path.join(out, "tif")))
    assert tifs == ["bos_pattern_image_1.tif", "bos_pattern_image_2.tif"]

    im1 = read_tiff16(os.path.join(out, "tif", tifs[0]))
    im2 = read_tiff16(os.path.join(out, "tif", tifs[1]))
    assert im1.shape == (64, 64) and im1.sum() > 0
    # density gradients must displace the im2 dots
    assert np.abs(im1.astype(np.int64) - im2.astype(np.int64)).sum() > 0

    raws = sorted(os.listdir(os.path.join(out, "raw")))
    assert raws == ["bos_pattern_image_1.bin", "bos_pattern_image_2.bin"]
    with open(os.path.join(out, "parameters.json")) as f:
        assert json.load(f)["simulation_type"] == "bos"
    assert os.path.exists(os.path.join(out, "positions.json"))


def test_cli_make_sample(tmp_path):
    p = os.path.join(tmp_path, "sample_bos.json")
    assert main([p, "--make-sample", "bos"]) == 0
    with open(p) as f:
        d = json.load(f)
    assert d["simulation_type"] == "bos"
    assert d["bos_pattern"]["lightray_number_per_particle"] == 500
