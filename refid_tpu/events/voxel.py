"""Event stream -> temporal-bin voxel grid.

Semantics match the reference voxelizer (basicsr/data/event_util.py:6-66):
events ``[t, x, y, p]`` are scattered into a ``(num_bins, H, W)`` grid with
bilinear interpolation along the time axis.  Timestamps are rescaled so the
stream spans ``[0, num_bins - 1]``; each event votes ``p * (1 - dt)`` into its
floor bin and ``p * dt`` into the next bin; zero polarity is remapped to -1.

Three implementations:
  * :func:`events_to_voxel_grid`       — host-side numpy (``np.add.at``).
  * :func:`events_to_voxel_grid_jax`   — device-side XLA scatter-add, jittable
    with a static event-capacity pad (TPU replacement for the torch
    ``index_add_`` twin at event_util.py:69-138).
  * refid_tpu.events.voxel_pallas      — Pallas TPU one-hot-matmul kernel.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "events_to_voxel_grid",
    "events_to_voxel_grid_jax",
    "voxel_norm",
    "voxel_norm_np",
    "event_reverse",
    "filter_event",
]


def events_to_voxel_grid(events, num_bins, width, height, return_format="CHW"):
    """Voxelize an ``(N, 4)`` float array of ``[t, x, y, p]`` events (numpy).

    Matches reference semantics (event_util.py:6-66) including:
      * time normalized by (first, last) event timestamps, deltaT==0 -> 1.0
      * polarity 0 remapped to -1
      * left votes kept for ``ti < num_bins``; right votes for ``ti+1 < num_bins``

    Unlike the reference this does NOT mutate ``events`` in place.
    """
    events = np.asarray(events)
    assert events.ndim == 2 and events.shape[1] == 4
    assert num_bins > 0 and width > 0 and height > 0
    if return_format not in ("CHW", "HWC"):
        raise ValueError(f"unknown return_format {return_format!r}")

    # native C++ fast path (~80x over np.add.at on this host); identical
    # semantics, see native/voxelize.cc
    import os as _os
    if events.shape[0] > 0 and not _os.environ.get("REFID_TPU_NO_NATIVE"):
        from refid_tpu.ops.native import voxelize_native_or_none
        grid = voxelize_native_or_none(events, num_bins, width, height)
        if grid is not None:
            if return_format == "CHW":
                return grid
            return grid.transpose(1, 2, 0)

    voxel_grid = np.zeros((num_bins * height * width,), np.float32)
    if events.shape[0] > 0:
        first_stamp = events[0, 0]
        last_stamp = events[-1, 0]
        delta_t = last_stamp - first_stamp
        if delta_t == 0:
            delta_t = 1.0

        ts = (num_bins - 1) * (events[:, 0] - first_stamp) / delta_t
        xs = events[:, 1].astype(np.int64)
        ys = events[:, 2].astype(np.int64)
        pols = events[:, 3].copy()
        pols[pols == 0] = -1

        tis = ts.astype(np.int64)  # trunc, as in the reference
        dts = ts - tis
        vals_left = pols * (1.0 - dts)
        vals_right = pols * dts

        valid = tis < num_bins
        np.add.at(
            voxel_grid,
            xs[valid] + ys[valid] * width + tis[valid] * width * height,
            vals_left[valid],
        )
        valid = (tis + 1) < num_bins
        np.add.at(
            voxel_grid,
            xs[valid] + ys[valid] * width + (tis[valid] + 1) * width * height,
            vals_right[valid],
        )

    voxel_grid = voxel_grid.reshape(num_bins, height, width)
    if return_format == "CHW":
        return voxel_grid
    elif return_format == "HWC":
        return voxel_grid.transpose(1, 2, 0)
    raise ValueError(f"unknown return_format {return_format!r}")


def _voxelize_padded(events: jnp.ndarray, n_valid: jnp.ndarray, num_bins: int,
                     width: int, height: int) -> jnp.ndarray:
    """Core jittable voxelizer over a fixed-capacity padded event buffer.

    ``events``: (CAP, 4) ``[t, x, y, p]``, rows >= n_valid are padding.
    Returns (num_bins, height, width) float32.
    """
    cap = events.shape[0]
    idx = jnp.arange(cap)
    in_range = idx < n_valid

    t = events[:, 0]
    # first/last valid timestamps (stream is time-sorted, like the reference)
    first_stamp = t[0]
    last_stamp = t[jnp.maximum(n_valid - 1, 0)]
    delta_t = last_stamp - first_stamp
    delta_t = jnp.where(delta_t == 0, 1.0, delta_t)

    ts = (num_bins - 1) * (t - first_stamp) / delta_t
    xs = events[:, 1].astype(jnp.int32)
    ys = events[:, 2].astype(jnp.int32)
    pols = events[:, 3]
    pols = jnp.where(pols == 0, -1.0, pols)

    tis = ts.astype(jnp.int32)  # trunc toward zero, matches numpy astype
    dts = ts - tis.astype(ts.dtype)
    vals_left = pols * (1.0 - dts)
    vals_right = pols * dts

    flat_base = xs + ys * width
    size = num_bins * height * width

    left_ok = in_range & (tis < num_bins)
    right_ok = in_range & (tis + 1 < num_bins)
    left_idx = jnp.where(left_ok, flat_base + tis * (width * height), size)
    right_idx = jnp.where(right_ok, flat_base + (tis + 1) * (width * height), size)

    grid = jnp.zeros((size,), jnp.float32)
    # out-of-bounds (== size) indices are dropped by scatter mode "drop"
    grid = grid.at[left_idx].add(jnp.where(left_ok, vals_left, 0.0), mode="drop")
    grid = grid.at[right_idx].add(jnp.where(right_ok, vals_right, 0.0), mode="drop")
    return grid.reshape(num_bins, height, width)


# jit with static (num_bins, width, height); event capacity is shape-static.
_voxelize_padded_jit = jax.jit(
    _voxelize_padded, static_argnames=("num_bins", "width", "height")
)


def events_to_voxel_grid_jax(events, num_bins, width, height,
                             return_format="CHW", capacity=None):
    """Device-side voxelization via XLA scatter-add.

    Pads the event array to ``capacity`` (default: next power of two) so that
    repeated calls with similar event counts reuse the compiled executable.
    """
    if return_format not in ("CHW", "HWC"):
        raise ValueError(f"unknown return_format {return_format!r}")
    events = np.asarray(events, dtype=np.float32)
    n = events.shape[0]
    if capacity is None:
        capacity = max(1024, 1 << int(np.ceil(np.log2(max(n, 1)))))
    assert capacity >= n
    padded = np.zeros((capacity, 4), np.float32)
    padded[:n] = events
    grid = _voxelize_padded_jit(jnp.asarray(padded), jnp.int32(n),
                                num_bins=num_bins, width=width, height=height)
    if return_format == "CHW":
        return grid
    elif return_format == "HWC":
        return jnp.transpose(grid, (1, 2, 0))
    raise ValueError(f"unknown return_format {return_format!r}")


def voxel_norm(voxel: jnp.ndarray) -> jnp.ndarray:
    """Zero-mean/unit-std normalization over the NONZERO voxel entries.

    Matches reference ``voxel_norm`` (event_util.py:141-160).  NOTE: the
    reference recurrent datasets call this in a loop that silently discards
    the result (image_npy_dataset.py:206-208) — dataset pipelines must honor
    that quirk for checkpoint parity (see ``apply_voxel_norm`` flags).
    """
    nonzero = voxel != 0
    num_nonzeros = jnp.sum(nonzero)

    def _norm(v):
        mean = jnp.sum(v) / num_nonzeros
        stddev = jnp.sqrt(jnp.sum(v ** 2) / num_nonzeros - mean ** 2)
        return jnp.where(nonzero, (v - mean) / stddev, 0.0)

    return jax.lax.cond(num_nonzeros > 0, _norm, lambda v: v, voxel)


def voxel_norm_np(voxel: np.ndarray) -> np.ndarray:
    """Numpy twin of :func:`voxel_norm` for host pipelines."""
    nonzero = voxel != 0
    num_nonzeros = nonzero.sum()
    if num_nonzeros > 0:
        mean = voxel.sum() / num_nonzeros
        stddev = np.sqrt((voxel ** 2).sum() / num_nonzeros - mean ** 2)
        voxel = np.where(nonzero, (voxel - mean) / stddev, 0.0).astype(voxel.dtype)
    return voxel


def event_reverse(events: np.ndarray) -> np.ndarray:
    """Reverse the temporal direction of an ``[t, x, y, p]`` event stream.

    Timestamps become ``t_max - t`` (re-sorted ascending), polarities negate;
    matches reference ``event_reverse`` (image_npy_dataset.py:530-552) without
    mutating the input.
    """
    events = np.asarray(events)
    out = np.empty_like(events)
    out[:, 0] = (events[-1, 0] - events[:, 0])[::-1]
    out[:, 1] = events[::-1, 1]
    out[:, 2] = events[::-1, 2]
    out[:, 3] = -events[::-1, 3]
    return out


def filter_event(x, y, p, t, s_e_index=(0, 6)):
    """Keep events whose discretized timestamp index lies in ``s_e_index``
    (both ends inclusive).  Reference: event_util.py:186-200."""
    t_1 = t.squeeze(1) if t.ndim == 2 else t
    _, inverse = np.unique(t_1, return_inverse=True)
    counts = np.bincount(inverse)
    start = int(np.sum(counts[: s_e_index[0]]))
    end = int(np.sum(counts[: s_e_index[1] + 1]))
    return x[start:end], y[start:end], p[start:end], t[start:end]
