from dg_tta_tpu.tta.plan import TTAPlan, TEMPLATE_PLAN
