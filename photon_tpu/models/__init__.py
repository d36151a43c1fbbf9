from photon_tpu.models.optics import (  # noqa: F401
    OpticalElement,
    OpticalAssembly,
    ElementStack,
    CameraSetup,
    lensmaker_refractive_index,
    create_camera_optical_system,
    camera_setup,
    rotation_matrix,
    rotate_coordinates,
)
