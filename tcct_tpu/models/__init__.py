from tcct_tpu.models.registry import get_model, list_models
from tcct_tpu.models.ftc import FTC, MPUpBlock, norm_add, gate_fusion, simple_fusion
from tcct_tpu.models.mpvit import MPViT, MPViTConfig
from tcct_tpu.models.crosscnn import CrossResNet, CrossCNNBlock
from tcct_tpu.models.regnet import RegNet
