from dg_tta_tpu.utils.paths import (
    check_dga_root_is_set,
    dg_tta_root,
    maybe_convert_to_dataset_name,
    nnunet_raw,
    nnunet_results,
    set_environ_vars_from_paths_sh,
)
