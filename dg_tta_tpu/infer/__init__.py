from dg_tta_tpu.infer.sliding_window import (
    compute_gaussian,
    compute_steps_for_sliding_window,
    make_sliding_window_predictor,
    predict_volume,
)
