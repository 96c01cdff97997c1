"""Device-mesh utilities, data-parallel shardings, and the sharded tiled
high-resolution sampler."""
from ucdir_tpu.parallel.mesh import make_mesh, data_sharding, replicate_sharding
