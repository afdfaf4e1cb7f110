from dg_tta_tpu.data.io import (
    SUPPORTED_ENDINGS,
    UnsupportedImageFormat,
    read_image,
    write_image,
)
from dg_tta_tpu.data.nifti import read_nifti, write_nifti
from dg_tta_tpu.data.preprocess import (
    Fingerprint,
    crop_to_nonzero,
    preprocess_case,
    resample_to_spacing,
    undo_preprocessing_logits,
)
