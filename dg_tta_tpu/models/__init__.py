from dg_tta_tpu.models.plans import ArchSpec, load_plans, arch_spec_from_plans
from dg_tta_tpu.models.unet import init_unet_params, unet_apply
from dg_tta_tpu.models.convert import torch_state_dict_to_params
