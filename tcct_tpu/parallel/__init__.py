from tcct_tpu.parallel.mesh import make_mesh, shard_batch, replicate, data_sharding, pick_dp_devices
