from tcct_tpu.data.geometry import GEOMETRY, DatasetGeometry, get_geometry
from tcct_tpu.data.eyeset import EyeSet
from tcct_tpu.data.augment import train_augment_batch, val_augment_batch
