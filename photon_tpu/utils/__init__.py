from photon_tpu.utils.nrrd_io import read_nrrd, write_nrrd  # noqa: F401
from photon_tpu.utils.tiff_io import write_tiff16, read_tiff16  # noqa: F401
from photon_tpu.utils.rng import GlibcRand, lens_samples  # noqa: F401
