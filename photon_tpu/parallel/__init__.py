from photon_tpu.parallel.shard import (  # noqa: F401
    make_mesh,
    shard_rays,
    sharded_render,
    multihost_init,
)
