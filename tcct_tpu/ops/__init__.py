from tcct_tpu.ops.resize import resize_bilinear, resize_bicubic, resize_nearest
from tcct_tpu.ops.pool import (
    avg_pool_2d,
    max_pool_2d,
    metapool_tokens,
    metapool_spatial,
)
