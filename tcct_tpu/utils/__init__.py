from tcct_tpu.utils.logging import MetricLogger
