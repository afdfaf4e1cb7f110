from dg_tta_tpu.ops.gin import gin_aug
from dg_tta_tpu.ops.mind import mind3d, MIND_OUT_CHANNELS
