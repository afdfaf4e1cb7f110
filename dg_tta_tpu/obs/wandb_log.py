"""Optional wandb logging, guarded exactly like the reference
(config_log_utils.py:73-84, 397-402): every call is a no-op unless wandb is
importable AND a run is active and not disabled."""

import importlib.util


def wandb_module():
    if importlib.util.find_spec("wandb") is None:
        return None
    import wandb
    return wandb


def wandb_run_is_available() -> bool:
    wandb = wandb_module()
    return (wandb is not None and wandb.run is not None
            and not wandb.run.disabled)


def wandb_log(data: dict, step=None):
    if wandb_run_is_available():
        wandb_module().log(data, step=step)


def wandb_run(project_name: str, fn, **kwargs):
    """Wrap fn in a wandb run when available; otherwise call it directly."""
    wandb = wandb_module()
    config = kwargs.get("plan")
    mode = getattr(config, "wandb_mode", "disabled")
    if wandb is None or mode == "disabled":
        return fn(**kwargs)
    with wandb.init(project=project_name, name=kwargs.get("run_name"),
                    mode=mode,
                    config=config.to_dict() if config else None):
        out = fn(**kwargs)
    wandb.finish()
    return out
