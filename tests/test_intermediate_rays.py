"""Intermediate ray-trajectory recording (the reference's
save_intermediate_ray_data dumps) and their round-trip through the
pipeline + analysis loader."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_bos_pipeline import bos_case, gradient_volume_between
from photon_tpu.models.optics import camera_setup
from photon_tpu.ops.lens import RayBundle
from photon_tpu.ops.march import march_rays


def _rays(P=6):
    xs = np.linspace(-4e4, 4e4, P).astype(np.float32)
    pos = np.stack([xs, np.zeros(P), np.full(P, -5e4)], -1).astype(np.float32)
    dirs = np.tile(np.asarray([0.0, 0.0, -1.0], np.float32), (P, 1))
    return RayBundle(jnp.asarray(pos), jnp.asarray(dirs),
                     jnp.zeros(P), jnp.ones(P))


@pytest.mark.parametrize("algorithm", [1, 2, 3, 4])
def test_recording_traces_the_march(algorithm):
    cfg = bos_case("general")
    setup = camera_setup(cfg)
    vol, *_ = gradient_volume_between(setup, n=16)
    rays = _rays()
    S, n_rec = 40, 4

    out, (ipos, idir) = march_rays(vol, rays, algorithm=algorithm,
                                   record_steps=S, record_rays=n_rec)
    assert ipos.shape == (n_rec, S, 3) and idir.shape == (n_rec, S, 3)
    ipos = np.asarray(ipos)
    idir = np.asarray(idir)

    for r in range(n_rec):
        fin = np.isfinite(ipos[r, :, 2])
        assert fin.sum() >= 3, "too few recorded steps"
        zs = ipos[r, fin, 2]
        # marching toward -z: recorded z never increases (RK45 records
        # rejected/retried iterations too, like the reference's loop-top
        # recording, so consecutive equal z values are expected there)
        assert (np.diff(zs) <= 0).all()
        assert (np.diff(zs) < 0).any()
        # trajectory starts at/near the volume entry
        assert zs[0] <= float(vol.max_bound[2]) + float(vol.step_size)
        # recorded directions stay unit
        nrm = np.linalg.norm(idir[r, fin], axis=1)
        np.testing.assert_allclose(nrm, 1.0, atol=1e-4)

    # trajectory bends the same way as the final deflection
    dx_final = np.asarray(out.dir)[:4, 0]
    dx_rec = np.array([idir[r, np.isfinite(idir[r, :, 0]), 0][-1]
                       for r in range(n_rec)])
    np.testing.assert_allclose(dx_rec, dx_final, atol=5e-4)


def test_recording_rejects_differentiable_path():
    cfg = bos_case("general")
    setup = camera_setup(cfg)
    vol, *_ = gradient_volume_between(setup, n=16)
    with pytest.raises(ValueError):
        march_rays(vol, _rays(), algorithm=2, differentiable=True,
                   num_steps=8, record_steps=10)


def test_pipeline_intermediate_dump_roundtrip(tmp_path):
    """run_bos with save_intermediate_ray_data writes the reference-layout
    bins; the analysis loader recovers a curved trajectory consistent
    with the marcher."""
    from photon_tpu.analysis.light_rays import (load_intermediate_ray_data,
                                                load_ray_data)
    from photon_tpu.utils.nrrd_io import write_nrrd
    from photon_tpu.pipeline import run_bos

    cfg = bos_case("general", n_dots=4, rays=8)
    setup = camera_setup(cfg)
    vol, *_ = gradient_volume_between(setup, n=16)

    # author an NRRD for the pipeline to load (rho = (n-1)/K)
    n = 16
    extent = 4e5
    x = np.linspace(-extent / 2, extent / 2, n)
    z_dots = setup.object_distance
    z = np.linspace(z_dots - 0.6 * setup.object_distance,
                    z_dots - 0.1 * setup.object_distance, n)
    rho = 1.225 + 4.0 * (x[:, None, None] - x.min()) / (x.max() - x.min()) \
        * np.ones((1, n, n))
    nrrd_path = os.path.join(tmp_path, "vol.nrrd")
    write_nrrd(nrrd_path, rho.astype(np.float32),
               spacings=(x[1] - x[0], x[1] - x[0], z[1] - z[0]),
               space_origin=(x[0], x[0], z[0]))

    cfg.density_gradients.simulate_density_gradients = True
    cfg.density_gradients.density_gradient_filename = nrrd_path
    cfg.output_data.image_directory = str(tmp_path)
    cfg.output_data.save_lightrays = True
    cfg.output_data.save_intermediate_ray_data = True
    cfg.output_data.num_lightrays_save = 6
    cfg.output_data.num_intermediate_positions_save = 32
    run_bos(cfg)

    pos_dir = os.path.join(tmp_path, "light-ray-positions", "im2")
    dir_dir = os.path.join(tmp_path, "light-ray-directions", "im2")
    traj = load_intermediate_ray_data(pos_dir, 32)
    tdir = load_intermediate_ray_data(dir_dir, 32,
                                      prefix="intermediate_dir")
    assert traj.shape == (6, 32, 3) and tdir.shape == (6, 32, 3)
    fin = np.isfinite(traj[0, :, 2])
    assert fin.sum() >= 3
    assert (np.diff(traj[0, fin, 2]) < 0).all()
    # final-ray dumps still load (not shadowed by the intermediate files)
    final = load_ray_data(pos_dir, "pos")
    assert final.shape[0] == 6
