"""Volume orientation views (the reference's ipynb_utils.py:53-138
equivalents): 3-plane x 4-slice grids for eyeballing dataset orientation."""

from pathlib import Path

import numpy as np


def plane_grid(vol, n_slices: int = 4):
    """Slice index grid per axis: {axis: [i0..i3]}."""
    vol = np.asarray(vol)
    return {ax: np.linspace(0, vol.shape[ax] - 1, n_slices).astype(int)
            for ax in range(3)}


def show_planes(vol, title: str = "", n_slices: int = 4, save_path=None):
    """Render a 3x4 grid of orthogonal slices; returns the figure."""
    import matplotlib
    if save_path is not None:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    vol = np.asarray(vol)
    assert vol.ndim == 3, vol.shape
    fig, axes = plt.subplots(3, n_slices, figsize=(3 * n_slices, 9))
    for row, (ax_idx, idxs) in enumerate(plane_grid(vol, n_slices).items()):
        for col, i in enumerate(idxs):
            sl = np.take(vol, i, axis=ax_idx)
            axes[row, col].imshow(sl, cmap="gray")
            axes[row, col].set_title(f"axis{ax_idx}[{i}]")
            axes[row, col].axis("off")
    fig.suptitle(title)
    if save_path is not None:
        fig.savefig(save_path)
        plt.close(fig)
    return fig


def show_image_file(path, **kw):
    from dg_tta_tpu.data.io import read_image
    data, props = read_image(path)
    return show_planes(data[0], title=f"{Path(path).name} "
                                      f"spacing={props['spacing']}", **kw)


def show_ts104_reference_image(save_path=None):
    """Display the TS104 canonical-orientation reference screenshot
    (reference ipynb_utils.py:141-151 `show_ts104_image`) so users can
    compare their dataset's orientation against it in the check notebook.

    The PNG ships with the reference package resources; when that mount is
    absent this raises FileNotFoundError naming the expected path (there is
    no meaningful fallback for a photograph)."""
    from dg_tta_tpu.resources import REFERENCE_RESOURCES
    img_path = REFERENCE_RESOURCES / "TS104_input_view.png"
    if not img_path.is_file():
        raise FileNotFoundError(
            f"TS104 reference view not found at {img_path}; the reference "
            "resources are not mounted")
    import matplotlib
    if save_path is not None:
        matplotlib.use("Agg")
    import matplotlib.image
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(dpi=150.0, figsize=(7.0, 7.0))
    fig.set_facecolor("black")
    ax.imshow(matplotlib.image.imread(img_path))
    ax.axis("off")
    ax.set_facecolor("black")
    if save_path is not None:
        fig.savefig(save_path, facecolor="black")
        plt.close(fig)
    return fig
