from dg_tta_tpu.core.grid import (
    affine_grid,
    grid_sample,
    identity_grid,
)
from dg_tta_tpu.core.losses import soft_dice_loss, dice_coeff
from dg_tta_tpu.core.labels import (
    map_label_logits,
    map_label_argmaxed,
    generate_label_mapping,
    get_map_idxs,
)
