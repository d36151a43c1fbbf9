from photon_tpu.ops.sensor import (  # noqa: F401
    diffraction_splat,
    bilinear_splat,
    sensor_coordinates,
    cos4_falloff,
)
