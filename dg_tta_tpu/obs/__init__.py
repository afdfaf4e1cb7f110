from dg_tta_tpu.obs.plots import plot_run_results
from dg_tta_tpu.obs.timers import PhaseTimer
