"""Multi-chip execution: ray sharding over a device mesh.

The reference is single-GPU/single-process (SURVEY.md §2 parallelism
table); its only concurrency is the CUDA grid and host-side KMAX particle
chunking.  The TPU-native scaling model built here instead:

* a 1-D (or N-D) ``jax.sharding.Mesh`` over all devices/hosts;
* the particle batch (and hence the ray batch) sharded along the mesh's
  ``rays`` axis — rays are embarrassingly parallel;
* the density volume and optical parameters replicated per device (64^3 -
  512^3 float4 volumes are far below HBM);
* each shard scatter-adds into a local image, reduced with ``psum`` over
  the mesh — the collective rides ICI;
* gradients of (image -> loss) w.r.t. the replicated density field arrive
  per-shard and are all-reduced by the same ``psum`` in the backward pass,
  which XLA overlaps with the backward march.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def multihost_init(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed for multi-host pods (no-op single-host).

    The TPU-native replacement for "no communication backend" in the
    reference: on pod slices, call once per host before building meshes.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "rays"
              ) -> Mesh:
    """A 1-D mesh over (up to) all visible devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_rays(mesh: Mesh, *arrays, axis_name: str = "rays"):
    """Place per-particle arrays sharded along the mesh's ray axis.

    Each array's leading dimension must be divisible by the mesh size
    (pad upstream with zero-radiance particles).
    """
    sharding = NamedSharding(mesh, P(axis_name))
    return tuple(jax.device_put(a, sharding) for a in arrays)


def sharded_render(mesh: Mesh, render_chunk_fn, source_arrays, r1, r2,
                   axis_name: str = "rays"):
    """Render with particles sharded across the mesh, image psum-reduced.

    ``render_chunk_fn((x, y, z, radiance, diam, r1, r2)) -> image`` is the
    single-shard forward (e.g. photon_tpu.models.render.trace_chunk bound
    to its static params).  Each device renders its particle shard into a
    full-size local image; one ``psum`` over the mesh produces the final
    image on every device.
    """
    from jax import shard_map

    x, y, z, rad, diam = source_arrays

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis_name), P(axis_name), P(axis_name),
                       P(axis_name), P(axis_name), P(), P()),
             out_specs=P())
    def run(x, y, z, rad, diam, r1, r2):
        image = render_chunk_fn((x, y, z, rad, diam, r1, r2))
        return jax.lax.psum(image, axis_name)

    return jax.jit(run)(x, y, z, rad, diam, r1, r2)


def pad_to_multiple(arrays, multiple: int, radiance_index: int = 3):
    """Pad leading dims to a multiple of the mesh size.

    Padding particles carry zero radiance, so they render to nothing —
    the same trick the single-chip chunker uses.
    """
    n = arrays[0].shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return arrays, n
    out = []
    for i, a in enumerate(arrays):
        fill = np.zeros((pad,) + a.shape[1:], dtype=a.dtype)
        if i == 2:  # z coordinate: keep finite, away from the sensor
            fill += 1.0
        out.append(np.concatenate([np.asarray(a), fill]))
    return tuple(out), n
