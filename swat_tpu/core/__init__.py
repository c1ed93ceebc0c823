from swat_tpu.core.mesh import (
    MeshSpec,
    create_mesh,
    data_sharding,
    replicated,
    shard_batch,
)
from swat_tpu.core.precision import Precision, DEFAULT_PRECISION
