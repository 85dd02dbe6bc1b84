"""On-device post-processing: morphology, median filtering, connected
components.

Replaces the host scipy/skimage kernels of `utils/Evaluation.py`:
  * `apply_brainmask` (`Evaluation.py:84-89`): per-slice 2-D binary erosion
    (cross structuring element, 12 iterations) then residual masking.
  * `apply_3d_median_filter` (`Evaluation.py:108-110`): 5^3 median with
    scipy's default 'reflect' border mode.
  * `filter_3d_connected_components` (`Evaluation.py:113-127`):
    26-connected 3-D labeling, components with <= 7 voxels removed.
  * `compute_detection_rate` (`Evaluation.py:130-172`): per-20-slice-chunk
    component matching with a < 8 voxel filter.

Connected components use iterative min-label propagation (3^3 min-pool over
a flat-index seed), which is XLA-friendly: each sweep is one
`reduce_window`; a `while_loop` runs until a fixpoint.  Lesion-scale
components converge in O(component diameter) sweeps.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_INF = jnp.int32(2 ** 30)


# ---------------------------------------------------------------------------
# binary erosion (2-D cross, per slice)


def binary_erosion_2d(mask: Array, iterations: int = 12) -> Array:
    """scipy ``binary_erosion(structure=cross, iterations=n)`` parity with
    border_value=0.  mask: (..., H, W) bool/float -> bool."""
    m = mask.astype(bool)

    def erode_once(m: Array) -> Array:
        p = jnp.pad(m, [(0, 0)] * (m.ndim - 2) + [(1, 1), (1, 1)])
        c = p[..., 1:-1, 1:-1]
        up = p[..., :-2, 1:-1]
        down = p[..., 2:, 1:-1]
        left = p[..., 1:-1, :-2]
        right = p[..., 1:-1, 2:]
        return c & up & down & left & right

    return jax.lax.fori_loop(
        0, iterations, lambda _, m: erode_once(m), m)


def apply_brainmask(x: Array, brainmask: Array, erode: bool = True,
                    iterations: int = 12) -> Array:
    """Residual masking by (optionally eroded) brainmask
    (`Evaluation.py:84-89`).  x, brainmask: (..., H, W)."""
    m = brainmask.astype(bool)
    if erode:
        m = binary_erosion_2d(m, iterations)
    return x * m.astype(x.dtype)


# ---------------------------------------------------------------------------
# 3-D median filter


def _reflect_pad(vol: Array, r: int) -> Array:
    return jnp.pad(vol, r, mode="symmetric")  # scipy 'reflect' == numpy 'symmetric'


def median_from_slab(slab: Array, out_s: int, kernel: int = 5) -> Array:
    """k^3 median of a FULLY PADDED slab: slab is (out_s + 2r, H + 2r,
    W + 2r), output is (out_s, H, W).  Shared by the single-device chunked
    filter and the halo-exchange sharded filter."""
    r = kernel // 2
    H = slab.shape[1] - 2 * r
    W = slab.shape[2] - 2 * r
    views = [
        jax.lax.dynamic_slice(slab, (i, j, k), (out_s, H, W))
        for i in range(kernel)
        for j in range(kernel)
        for k in range(kernel)
    ]
    stack = jnp.stack(views, axis=0)
    return jnp.median(stack, axis=0)


def median_filter_3d(vol: Array, kernel: int = 5, chunk: int = 16) -> Array:
    """Exact k^3 median with 'reflect' borders, chunked over the leading
    axis to bound memory (k^3 stacked views per chunk).

    vol: (S, H, W) float32.
    """
    assert kernel % 2 == 1
    r = kernel // 2
    S, H, W = vol.shape
    padded = _reflect_pad(vol, r)

    # pad S up to a chunk multiple for static shapes
    n_chunks = -(-S // chunk)
    S_pad = n_chunks * chunk
    if S_pad != S:
        padded = jnp.pad(padded, ((0, S_pad - S), (0, 0), (0, 0)),
                         mode="edge")

    def do_chunk(c: Array) -> Array:
        start = c * chunk
        slab = jax.lax.dynamic_slice(
            padded, (start, 0, 0), (chunk + 2 * r, H + 2 * r, W + 2 * r))
        return median_from_slab(slab, chunk, kernel)

    out = jax.lax.map(do_chunk, jnp.arange(n_chunks))
    return out.reshape(S_pad, H, W)[:S]


# ---------------------------------------------------------------------------
# connected components (26-connectivity)


def _min_pool_3x3x3(labels: Array) -> Array:
    """Separable 3^3 min-pool: three 3-tap passes (9 compares) instead of
    one 27-tap window — box-min is exactly separable."""
    out = labels
    for axis in range(3):
        lo = jnp.concatenate([
            jax.lax.slice_in_dim(out, 0, 1, axis=axis),
            jax.lax.slice_in_dim(out, 0, out.shape[axis] - 1, axis=axis),
        ], axis=axis)
        hi = jnp.concatenate([
            jax.lax.slice_in_dim(out, 1, out.shape[axis], axis=axis),
            jax.lax.slice_in_dim(out, out.shape[axis] - 1, out.shape[axis],
                                 axis=axis),
        ], axis=axis)
        out = jnp.minimum(out, jnp.minimum(lo, hi))
    return out


def connected_components_3d(mask: Array, max_iters: int = 1024,
                            sweeps_per_check: int = 4,
                            return_converged: bool = False):
    """26-connected labeling via iterative min-label propagation.

    Each while-loop round runs ``sweeps_per_check`` 3^3 min-pool sweeps
    before the (device-side) convergence test, amortising the reduction.
    Union-find pointer jumping was evaluated and rejected: the random
    1-element gathers it needs serialize on TPU (15x slower than plain
    propagation at lesion-scale volumes).

    Worst-case bound (honest failure mode): a component whose minimal
    voxel is at graph distance D from its farthest voxel needs
    ``ceil(D / sweeps_per_check)`` rounds; if that exceeds ``max_iters``
    the loop stops and the component is returned PARTIALLY MERGED
    (split into >1 labels) with no error.  The default cap covers paths
    up to 4096 voxels — far beyond lesion scale, but reachable by a
    pathological space-filling snake.  Pass ``return_converged=True`` to
    additionally get a scalar bool that is False exactly when the cap
    was hit before the fixpoint.

    Returns int32 labels: 0 = background, else 1 + flat index of the
    component's minimal voxel (a stable, order-independent component id);
    with ``return_converged=True``, returns ``(labels, converged)``.
    """
    mask = mask.astype(bool)
    n = mask.size
    seed = (jnp.arange(n, dtype=jnp.int32).reshape(mask.shape) + 1)
    labels = jnp.where(mask, seed, _INF)

    def cond(state):
        labels, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        new = labels
        for _ in range(sweeps_per_check):
            new = jnp.where(mask,
                            jnp.minimum(new, _min_pool_3x3x3(new)), _INF)
        return new, jnp.any(new != labels), it + 1

    labels, changed, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.bool_(True), jnp.int32(0)))
    out = jnp.where(mask, labels, 0).astype(jnp.int32)
    if return_converged:
        # the loop exits either at the fixpoint (changed == False) or at
        # the iteration cap with merging still in progress
        return out, jnp.logical_not(changed)
    return out


def component_sizes(labels: Array) -> Array:
    """sizes[l] = voxel count of label l (index 0 = background), shape
    (n_voxels + 1,) to cover any label id."""
    flat = labels.ravel()
    sizes = jnp.zeros((labels.size + 1,), jnp.int32)
    return sizes.at[flat].add((flat > 0).astype(jnp.int32))


def per_voxel_component_size(labels: Array) -> Array:
    """Size of each voxel's component (0 for background voxels).

    Sort-scan-sort formulation, no scatters or random gathers: key-sort
    (label, position), measure each sorted run's length with a forward
    cummax of run-start positions and a reverse cummin of run-end
    positions, then key-sort back by position.  (Measured on TPU v5e at
    448x128x128: 70 ms vs 165 ms for the scatter-add histogram + gather —
    the same serialization the metric sweep hit; an earlier
    sort+SEARCHSORTED variant was 549 ms because the per-voxel
    searchsorted gathers serialized, the scans here do not.)"""
    n = labels.size
    flat = labels.ravel()
    pos = jnp.arange(n, dtype=jnp.int32)
    sl, sp = jax.lax.sort((flat, pos), num_keys=1)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sl[1:] != sl[:-1]])
    is_end = jnp.concatenate([is_start[1:], jnp.ones((1,), bool)])
    start_pos = jax.lax.cummax(jnp.where(is_start, pos, -1))
    end_masked = jnp.where(is_end, pos, jnp.int32(n))
    end_pos = jnp.flip(jax.lax.cummin(jnp.flip(end_masked)))
    size_sorted = jnp.where(sl > 0, end_pos - start_pos + 1, 0)
    _, sizes = jax.lax.sort((sp, size_sorted), num_keys=1)
    return sizes.reshape(labels.shape)


def num_components(labels: Array) -> Array:
    """Number of distinct components: count of root voxels whose label
    equals their own seed id."""
    seed = (jnp.arange(labels.size, dtype=jnp.int32)
            .reshape(labels.shape) + 1)
    return jnp.sum((labels == seed) & (labels > 0))


def filter_small_components(mask: Array, min_size: int = 7,
                            max_iters: int = 1024,
                            return_converged: bool = False):
    """Remove 26-connected components with filled_area <= min_size
    (`Evaluation.py:113-127`).  mask: (S, H, W) -> float32 0/1.

    With ``return_converged`` the device-resident bool from
    `connected_components_3d` is passed through so callers can surface a
    warning when the iteration cap truncated label propagation (fragments
    of a snake-shaped component could then be dropped as 'small')."""
    m = mask.astype(bool)
    labels, converged = connected_components_3d(
        m, max_iters, return_converged=True)
    keep = per_voxel_component_size(labels) > min_size
    out = (m & keep).astype(jnp.float32)
    if return_converged:
        return out, converged
    return out


def _labels_hit(labels: Array, hit_mask: Array) -> Array:
    """Number of distinct non-zero labels present under hit_mask —
    scatter-free: sort the masked labels and count run transitions."""
    flat = jnp.where(hit_mask.ravel(), labels.ravel(), 0)
    sorted_l = jnp.sort(flat)
    is_new = jnp.concatenate([
        sorted_l[:1] > 0, (sorted_l[1:] != sorted_l[:-1]) & (sorted_l[1:] > 0)])
    return jnp.sum(is_new)


def detection_counts_chunk(pred: Array, gt: Array,
                           max_iters: int = 512
                           ) -> Tuple[Array, Array, Array, Array]:
    """(TPs, FPs, FNs, converged) for one slice chunk, parity with
    `Evaluation.py:130-172`:
      * TP  = number of components of pred AND gt,
      * pred components with < 8 voxels are dropped before FP counting,
      * FP  = pred components not touched by any intersection component,
      * FN  = gt components not touched by any intersection component.
    """
    pred = pred.astype(bool)
    gt = gt.astype(bool)
    inter = pred & gt
    cc_inter, conv_i = connected_components_3d(
        inter, max_iters, return_converged=True)
    tps = num_components(cc_inter)

    cc_pred, conv_p = connected_components_3d(
        pred, max_iters, return_converged=True)
    cc_pred = jnp.where(per_voxel_component_size(cc_pred) >= 8, cc_pred, 0)
    n_pred = _labels_hit(cc_pred, cc_pred > 0)
    pred_hit = _labels_hit(cc_pred, inter)
    fps = n_pred - pred_hit

    cc_gt, conv_g = connected_components_3d(
        gt, max_iters, return_converged=True)
    n_gt = num_components(cc_gt)
    gt_hit = _labels_hit(cc_gt, inter)
    fns = n_gt - gt_hit
    return tps, fps, fns, conv_i & conv_p & conv_g


def volume_to_chunks(volume: Array, chunk: int = 20) -> Array:
    """Split a (S, H, W) volume into zero-padded (n, chunk, H, W) chunks.
    Zero padding adds no components, so detection counts are unchanged."""
    S, H, W = volume.shape
    n = -(-S // chunk)
    padded = jnp.pad(volume.astype(jnp.float32),
                     ((0, n * chunk - S), (0, 0), (0, 0)))
    return padded.reshape(n, chunk, H, W)


detection_counts_batch = jax.jit(jax.vmap(detection_counts_chunk))


def compute_detection_rate(pred_volume: Array, gt_volume: Array,
                           chunk: int = 20) -> Tuple[Array, Array, Array]:
    """Lesion-detection TP/FP/FN over per-20-slice chunks
    (`Evaluation.py:130-172`), batched over chunks in one dispatch."""
    t, f, n, _ = detection_counts_batch(
        volume_to_chunks(pred_volume, chunk),
        volume_to_chunks(gt_volume, chunk))
    return jnp.sum(t), jnp.sum(f), jnp.sum(n)


# ---------------------------------------------------------------------------
# misc eval ops


def positive_residual(x: Array, x_rec: Array,
                      keep_only_positive: bool = True) -> Array:
    """max(x - x_rec, 0) or |x - x_rec| (`Evaluation.py:283-287`)."""
    if keep_only_positive:
        return jnp.maximum(x - x_rec, 0.0)
    return jnp.abs(x - x_rec)


def hyperintensity_prior_mask(diff: Array, x: Array, quantile_value: Array
                              ) -> Array:
    """Zero residuals where the input is below the hyperintensity prior
    quantile (`Evaluation.py:288-289`)."""
    return jnp.where(x < quantile_value, 0.0, diff)
