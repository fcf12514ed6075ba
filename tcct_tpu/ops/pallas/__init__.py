from tcct_tpu.ops.pallas.bnstats import bn_act_train_packed_pallas
from tcct_tpu.ops.pallas.metapool import metapool_tokens_pallas
