from dg_tta_tpu.tta.plan import TTAPlan, TEMPLATE_PLAN
from dg_tta_tpu.tta.engine import (
    TTAFunctions,
    make_tta_functions,
    params_with_grad_mask,
    tta_one_volume,
)
