"""MIND-SSC: Modality-Independent Neighbourhood Descriptor (self-similarity).

TPU-native re-design of the reference's MIND3D module
(/root/reference/dg_tta/mind.py:97-164, after Heinrich et al.): for each voxel,
12 self-similarity channels from the 6-neighbourhood (all directed pairs of
neighbours at squared distance 2), computed as Gaussian-smoothed SSDs of
shifted image pairs, min-subtracted, variance-normalized (clamped) and mapped
through exp(-x).

Design notes:
  * The reference realizes the shifts as conv3d with one-hot 3^3 kernels.
    On TPU a conv with a one-hot kernel is a wasted MXU pass; the shifts here
    are static slices of a replicate-padded volume, which XLA turns into pure
    (often fused) memory ops.
  * The reference injects N(0, 0.05) noise into the edge maps even at
    inference (mind.py:150-152). That behavior is preserved behind
    `noise_scale` (pass 0.0 or key=None to disable deterministically).
  * Channels-last layout: (B, D, H, W, 1) -> (B, D, H, W, 12).
"""

import numpy as np

import jax
import jax.numpy as jnp

MIND_OUT_CHANNELS = 12


def _ssc_shift_pairs():
    """The 12 directed (shift1, shift2) offset pairs of the SSC pattern.

    Derived from the 6-neighbourhood of a 3x3x3 cell: take all ordered pairs
    (i > j) of neighbours whose squared Euclidean distance is exactly 2
    (i.e. edge-adjacent neighbour pairs), then use each pair twice -- once in
    each direction -- giving 12 channels (mind.py:104-136 builds the same set
    via one-hot kernels; here we keep the offsets themselves).
    """
    six = np.array(
        [[0, 1, 1], [1, 1, 0], [1, 0, 1], [1, 1, 2], [2, 1, 1], [1, 2, 1]],
        dtype=np.int64,
    )
    # squared distances between all pairs
    d2 = ((six[:, None, :] - six[None, :, :]) ** 2).sum(-1)
    ii, jj = np.meshgrid(np.arange(6), np.arange(6), indexing="ij")
    mask = (ii > jj) & (d2 == 2)
    # for the flattened (i,j) grid, shift1 takes the row neighbour, shift2 the
    # column neighbour -- matching the reference's repeat/view construction
    s1 = six[np.repeat(np.arange(6), 6).reshape(6, 6)[mask]]
    s2 = six[np.tile(np.arange(6), 6).reshape(6, 6)[mask]]
    return s1, s2  # each (12, 3) with entries in {0,1,2}


_S1, _S2 = _ssc_shift_pairs()


def _shifted(padded, offset, delta, D, H, W):
    """Slice a (B, D+2d, H+2d, W+2d, 1) padded volume at a 3-cell offset."""
    oz, oy, ox = (int(o) * delta for o in offset)
    return jax.lax.slice(
        padded,
        (0, oz, oy, ox, 0),
        (padded.shape[0], oz + D, oy + H, ox + W, 1),
    )


def gaussian_kernel_1d(sigma: float, dtype=jnp.float32):
    """Normalized 1-D Gaussian taps, torch-reference sizing (mind.py:31-37)."""
    N = int(np.ceil(sigma * 3.0 / 2.0)) * 2 + 1
    x = np.linspace(-(N // 2), N // 2, N)
    w = np.exp(-(x**2) / (2 * sigma**2))
    w /= w.sum()
    return jnp.asarray(w, dtype)


def smooth3d(img, sigma: float):
    """Separable Gaussian blur with replicate padding, channels-last.

    img: (B, D, H, W, C). Matches the reference's filter1D stack
    (mind.py:5-43): replicate pad then 1-D convolve along each spatial axis.
    """
    w = gaussian_kernel_1d(sigma, img.dtype)
    N = w.shape[0]
    p = N // 2
    for axis in (1, 2, 3):
        pad = [(0, 0)] * 5
        pad[axis] = (p, p)
        x = jnp.pad(img, pad, mode="edge")
        # contract the window via conv: move axis last, use depthwise trick
        # cheaper: windowed weighted sum via lax.conv on a reshaped view.
        # Simplest robust form: gather N shifted slices and weighted-sum; N<=7
        # so this unrolls into fused adds.
        size = img.shape[axis]
        acc = None
        for t in range(N):
            sl = [slice(None)] * 5
            sl[axis] = slice(t, t + size)
            term = w[t] * x[tuple(sl)]
            acc = term if acc is None else acc + term
        img = acc
    return img


def mind3d(img, key=None, delta: int = 1, sigma: float = 1.0,
           noise_scale: float = 0.05):
    """Compute the 12-channel MIND-SSC descriptor.

    Args:
      img: (B, D, H, W, 1) channels-last volume.
      key: PRNG key for the reference's edge-map noise; None disables noise.
    Returns:
      (B, D, H, W, 12) descriptor in (0, 1].
    """
    B, D, H, W, C = img.shape
    assert C == 1, "MIND expects a single-channel volume"

    pd = delta
    padded = jnp.pad(
        img, ((0, 0), (pd, pd), (pd, pd), (pd, pd), (0, 0)), mode="edge"
    )

    edges = []
    for i in range(MIND_OUT_CHANNELS):
        a = _shifted(padded, _S1[i], delta, D, H, W)
        b = _shifted(padded, _S2[i], delta, D, H, W)
        edges.append(a - b)
    edge_sel = jnp.concatenate(edges, axis=-1)  # (B, D, H, W, 12)

    if key is not None and noise_scale:
        edge_sel = edge_sel + noise_scale * jax.random.normal(
            key, edge_sel.shape, edge_sel.dtype
        )

    ssd = smooth3d(edge_sel**2, sigma)

    mind = ssd - jnp.min(ssd, axis=-1, keepdims=True)
    mind_var = jnp.mean(mind, axis=-1, keepdims=True)
    global_mean = jnp.mean(mind_var)
    mind_var = jnp.clip(mind_var, global_mean * 0.001, global_mean * 1000)
    mind = mind / mind_var
    return jnp.exp(-mind)
