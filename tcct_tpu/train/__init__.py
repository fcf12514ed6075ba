from tcct_tpu.train.schedule import cyclic_lr
from tcct_tpu.train.state import TrainState, create_train_state
from tcct_tpu.train.step import build_train_step, build_eval_step, TrainConfig
from tcct_tpu.train.engine import Trainer
