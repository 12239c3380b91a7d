from scaleprotoseg_tpu.parallel.fetch import BulkFetcher  # noqa: F401
from scaleprotoseg_tpu.parallel.mesh import (  # noqa: F401
    assemble_global_batch, batch_sharding, create_mesh, create_mesh_2d,
    create_mesh_multislice, replicate, shard_batch, shard_batch_2d,
    spatial_batch_sharding, spatial_sharding, split_global_batch)
