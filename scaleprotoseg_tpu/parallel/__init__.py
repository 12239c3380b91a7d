from scaleprotoseg_tpu.parallel.fetch import BulkFetcher  # noqa: F401
from scaleprotoseg_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, create_mesh, replicate, shard_batch, spatial_sharding)
