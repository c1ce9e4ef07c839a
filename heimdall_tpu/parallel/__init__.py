from heimdall_tpu.parallel.mesh import make_mesh, mesh_info
from heimdall_tpu.parallel.sharding import (
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from heimdall_tpu.parallel.inspect_step import (
    make_sharded_inspection_step,
    make_line_step,
    make_pallas_data_parallel_step,
)
from heimdall_tpu.parallel import multihost
