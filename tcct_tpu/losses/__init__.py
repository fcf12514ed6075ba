from tcct_tpu.losses.seg import (
    dice_coef,
    dice2_coef,
    iou_coef,
    DiceLoss,
    IouLoss,
    MSELoss,
    MultiLoss,
    get_loss,
    mdice_score,
    mdice_scorem,
    mdice_scores,
    miou_score,
    miou_scorem,
    deep_supervision_loss,
)
from tcct_tpu.losses.boundary import boundary_regression_loss
from tcct_tpu.losses.polar import (
    polar_prototypes,
    optimize_prototypes,
    points_selection_bins,
    feature_polarization_loss,
)
