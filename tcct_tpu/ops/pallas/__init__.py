from tcct_tpu.ops.pallas.metapool import metapool_tokens_pallas
