from photon_tpu.parallel.shard import (  # noqa: F401
    make_mesh,
    multihost_init,
    pad_to_multiple,
    scaling_report,
)
