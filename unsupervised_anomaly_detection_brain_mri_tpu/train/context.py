"""Context-encoder masking, as an on-device op.

Parity: `trainers/CE.py:123-139` (``retrieve_masked_batch``): zero 1-3
random 20x20 boxes inside each sample's brain bounding box.  The reference
implemented this in host numpy per batch; here it is a jit-safe jnp function
executed inside the train step (no host round-trip).

Deliberate fix (documented deviation): the reference's loop
``for (m, brain_range) in zip(m, ...)`` shadows the mask array, so every
sample ends up multiplied with the LAST sample's mask (`trainers/CE.py:130`).
We apply each sample's own mask.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def brain_bbox(mask: Array) -> Tuple[Array, Array, Array, Array]:
    """Per-sample bounding box (r0, r1, c0, c1) of a boolean (B, H, W) mask.

    Empty masks produce a degenerate full-image box.
    """
    rows = jnp.any(mask, axis=2)  # (B, H)
    cols = jnp.any(mask, axis=1)  # (B, W)
    H = mask.shape[1]
    W = mask.shape[2]
    r0 = jnp.argmax(rows, axis=1)
    r1 = H - 1 - jnp.argmax(rows[:, ::-1], axis=1)
    c0 = jnp.argmax(cols, axis=1)
    c1 = W - 1 - jnp.argmax(cols[:, ::-1], axis=1)
    return r0, r1, c0, c1


def random_context_masks(
    rng: Array,
    images: Array,
    brainmask: Array,
    max_boxes: int = 3,
    box_size: int = 20,
) -> Array:
    """Return images with 1..max_boxes random box_size^2 boxes zeroed.

    images: (B, H, W, C); brainmask: (B, H, W) (bool or float>0).
    """
    B, H, W, _ = images.shape
    bmask = brainmask.astype(bool)
    r0, r1, c0, c1 = brain_bbox(bmask)
    k_rng, pos_rng = jax.random.split(rng)
    # number of boxes per sample ~ uniform{1..max_boxes}
    n_boxes = jax.random.randint(k_rng, (B,), 1, max_boxes + 1)

    # box top-left corners: uniform in [r0, r1 - box], guarded like the
    # reference (`trainers/CE.py:133-137`): skip if the bbox is too small.
    u = jax.random.uniform(pos_rng, (B, max_boxes, 2))
    r_span = jnp.maximum(r1 - box_size - r0, 0)
    c_span = jnp.maximum(c1 - box_size - c0, 0)
    br = (r0[:, None] + (u[..., 0] * (r_span[:, None] + 1)).astype(jnp.int32))
    bc = (c0[:, None] + (u[..., 1] * (c_span[:, None] + 1)).astype(jnp.int32))
    valid_bbox = ((r0 < r1 - box_size) & (c0 < c1 - box_size))[:, None]
    active = (jnp.arange(max_boxes)[None, :] < n_boxes[:, None]) & valid_bbox

    rr = jax.lax.broadcasted_iota(jnp.int32, (B, max_boxes, H, W), 2)
    cc = jax.lax.broadcasted_iota(jnp.int32, (B, max_boxes, H, W), 3)
    in_box = (
        (rr >= br[:, :, None, None]) & (rr < br[:, :, None, None] + box_size)
        & (cc >= bc[:, :, None, None]) & (cc < bc[:, :, None, None] + box_size)
        & active[:, :, None, None]
    )
    keep = ~jnp.any(in_box, axis=1)  # (B, H, W)
    return images * keep[..., None].astype(images.dtype)
