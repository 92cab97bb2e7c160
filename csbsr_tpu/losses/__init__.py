from .seg_losses import (
    weighted_bce,
    binary_dice,
    generalized_dice,
    bce_dice,
    boundary_loss,
    boundary_combo_loss,
    boundary_gdice_loss,
    generalized_boundary_combo_loss,
    bce,
    cross_entropy_loss_rcf,
)
from .sr_losses import l1_per_sample, l2_per_sample, get_pseudo_lr, kbpn_loss
from .oriented import (
    crack_oriented_exp_weight,
    segment_failure_oriented_exp_weight,
    crack_oriented_weight,
    segment_failure_oriented_weight,
    oriented_gaussian_map,
)
from .fa_loss import fa_loss
