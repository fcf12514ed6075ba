from tcct_tpu.task2.model import ClsModel
from tcct_tpu.task2.metrics import roc_auc, f1_score, accuracy
