"""Differentiable BOS inversion: recover a density field from images.

The capability the reference cannot offer (its CUDA kernel is forward-
only): because the whole photon_tpu forward — tube extraction, z-slab
march, lens, patch splat — is built from differentiable JAX primitives
with fixed trip counts, pixel intensities are differentiable w.r.t. the
density field.  This module wraps that into a simple gradient-descent
inversion: given an observed BOS image (pair), recover rho on the volume
grid.

Physics note: the forward only sees the refractive-index *gradient*
along ray paths, so the inversion recovers grad(n) projected onto the
data; a smoothness prior (Tikhonov on the Laplacian) regularizes the
nullspace.  This mirrors how BOS tomography is posed in practice.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from photon_tpu.config import SimulationConfig
from photon_tpu.models.optics import CameraSetup
from photon_tpu.models.render_fast import render_image_fast
from photon_tpu.models.scenes import LightfieldSource
from photon_tpu.volume import DensityVolume, build_density_volume


def volume_from_rho(rho, template: DensityVolume,
                    gladstone_dale: float = 0.225e-3) -> DensityVolume:
    """Rebuild the packed (grad n, n-1) field from a rho grid, in JAX.

    Differentiable twin of photon_tpu.volume.build_density_volume's
    numpy precompute: central differences interior, one-sided faces.
    ``rho`` is (W, H, D) indexed [x, y, z] like the NRRD layout.
    """
    n_minus_1 = gladstone_dale * rho
    sp = template.grid_spacing

    def grad_axis(f, axis, h):
        n = f.shape[axis]
        take = lambda idx: jnp.take(f, jnp.atleast_1d(idx), axis)  # noqa: E731
        lo = (-1.5 * take(0) + 2.0 * take(1) - 0.5 * take(2)) / h
        interior = (jnp.take(f, jnp.arange(2, n), axis)
                    - jnp.take(f, jnp.arange(0, n - 2), axis)) / (2.0 * h)
        hi = (1.5 * take(n - 1) - 2.0 * take(n - 2) + 0.5 * take(n - 3)) / h
        return jnp.concatenate([lo, interior, hi], axis)

    gx = grad_axis(n_minus_1, 0, sp[0])
    gy = grad_axis(n_minus_1, 1, sp[1])
    gz = grad_axis(n_minus_1, 2, sp[2])
    packed = jnp.stack([gx, gy, gz, n_minus_1], axis=-1)   # (W, H, D, 4)
    field = jnp.transpose(packed, (2, 1, 0, 3))            # (D, H, W, 4)
    return template._replace(field=field.astype(jnp.float32))


@dataclass
class InversionResult:
    rho: np.ndarray
    losses: list
    volume: DensityVolume


def invert_bos(cfg: SimulationConfig, setup: CameraSetup,
               source: LightfieldSource, r1, r2,
               observed_image, template: DensityVolume,
               rho0: Optional[np.ndarray] = None,
               steps: int = 50, learning_rate: float = 1.0,
               smoothness: float = 0.0,
               algorithm: int = 2,
               callback: Optional[Callable] = None) -> InversionResult:
    """Gradient-descent recovery of rho from an observed BOS image.

    Args:
      observed_image: (ny, nx) raw float image (the distorted im2).
      template: DensityVolume carrying the grid geometry; its field is
        ignored, ``rho0`` (default: uniform rho_0) seeds the solve.
      smoothness: Tikhonov weight on the 3-D Laplacian of rho.

    Returns rho on the template grid plus the loss history.
    """
    w, h, d = template.sizes
    if rho0 is None:
        rho0 = np.full((w, h, d), cfg.density_gradients.rho_0,
                       dtype=np.float32)
    target = jnp.asarray(observed_image, jnp.float32)
    gd = cfg.density_gradients.gladstone_dale

    def loss_fn(rho):
        vol = volume_from_rho(rho, template, gd)
        img = render_image_fast(cfg, setup, source, r1, r2, vol=vol,
                                algorithm=algorithm)
        data = jnp.mean((img - target) ** 2)
        if smoothness > 0.0:
            lap = (
                jnp.diff(rho, 2, axis=0)[:, 1:-1, 1:-1] ** 2
                + jnp.diff(rho, 2, axis=1)[1:-1, :, 1:-1] ** 2
                + jnp.diff(rho, 2, axis=2)[1:-1, 1:-1, :] ** 2)
            return data + smoothness * jnp.mean(lap)
        return data

    value_and_grad = jax.jit(jax.value_and_grad(loss_fn))

    rho = jnp.asarray(rho0, jnp.float32)
    losses = []
    # Adam keeps the step size meaningful across the tiny-gradient regime
    m = jnp.zeros_like(rho)
    v = jnp.zeros_like(rho)
    b1, b2, eps = 0.9, 0.999, 1e-12
    for t in range(1, steps + 1):
        loss, g = value_and_grad(rho)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mhat = m / (1 - b1 ** t)
        vhat = v / (1 - b2 ** t)
        rho = rho - learning_rate * mhat / (jnp.sqrt(vhat) + eps)
        losses.append(float(loss))
        if callback is not None:
            callback(t, float(loss), rho)

    rho_np = np.asarray(rho)
    vol = build_density_volume(
        rho_np, np.asarray(template.grid_spacing),
        [float(template.min_bound[0]), float(template.min_bound[1]),
         float(template.min_bound[2]) + 750e3],
        gladstone_dale=gd)
    return InversionResult(rho=rho_np, losses=losses, volume=vol)
