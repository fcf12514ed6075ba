from tcct_tpu.parallel.mesh import make_mesh, shard_batch, replicate, data_sharding, pick_dp_devices
from tcct_tpu.parallel.distributed import init_distributed, is_multiprocess_mesh, make_global_array
