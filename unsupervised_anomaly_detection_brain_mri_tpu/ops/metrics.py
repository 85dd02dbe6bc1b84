"""On-device segmentation/detection metrics.

Re-implements `trainers/Metrics.py` as jit-safe jnp: DICE, confusion
counts, TPR/FPR/precision/recall/VD, exact ROC-AUC (sklearn `roc_curve` +
trapezoid semantics incl. tie collapsing), exact average precision
(sklearn `average_precision_score` step-sum semantics), and the best-DICE
threshold search.

The reference's `compute_dice_curve_recursive` (`trainers/Metrics.py:
110-162`) adaptively refines a grid to granularity 1e-(g-1); here the
optimum over ALL distinct cut points is computed exactly in one sorted
sweep — a strict superset of the reference's search domain, on device.

The tie-collapsing machinery: co-sort (score, label) descending in ONE
multi-operand `lax.sort` (no argsort + random gather — large random
gathers serialize on TPU), take cumulative TP/FP, keep "group end"
positions where the score changes, and recover each group end's
PREDECESSOR-group value with a shifted masked cummax — valid because every
swept quantity (tps/fps/tpr/fpr) is monotone non-decreasing along the
sorted order.  This reproduces sklearn's curves exactly with static shapes
and zero random gathers (measured 55 ms vs 1939 ms — 35x — on the
7.3M-voxel eval sweep on TPU v5e vs the argsort + searchsorted + gather
formulation, whose random gathers serialized).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# pointwise / confusion metrics (parity: `trainers/Metrics.py:67-107`)


def dice(P: Array, G: Array) -> Array:
    """(2*sum(P*G)) / (sum(P)+sum(G)) — no epsilon (`Metrics.py:67-72`)."""
    P = P.astype(jnp.float32).ravel()
    G = G.astype(jnp.float32).ravel()
    return (2.0 * jnp.sum(P * G)) / (jnp.sum(P) + jnp.sum(G))


def confusion_matrix(P: Array, G: Array) -> Tuple[Array, Array, Array, Array]:
    P = P.astype(bool).ravel()
    G = G.astype(bool).ravel()
    tp = jnp.sum(P & G)
    fp = jnp.sum(P & ~G)
    fn = jnp.sum(~P & G)
    tn = jnp.sum(~P & ~G)
    return tp, fp, tn, fn


def tpr(P: Array, G: Array) -> Array:
    tp, fp, tn, fn = confusion_matrix(P, G)
    return tp / (tp + fn)


def fpr(P: Array, G: Array) -> Array:
    tp, fp, tn, fn = confusion_matrix(P, G)
    return fp / (fp + tn)


def precision(P: Array, G: Array) -> Array:
    tp, fp, tn, fn = confusion_matrix(P, G)
    return tp / (tp + fp)


def recall(P: Array, G: Array) -> Array:
    return tpr(P, G)


def vd(P: Array, G: Array) -> Array:
    """Volume difference: sum(|xor(P&G, G)|)/sum(G) (`Metrics.py:105-107`)."""
    P = P.astype(bool).ravel()
    G = G.astype(bool).ravel()
    tps = P & G
    return jnp.sum(jnp.logical_xor(tps, G).astype(jnp.float32)) / jnp.sum(
        G.astype(jnp.float32))


# ---------------------------------------------------------------------------
# sorted-sweep machinery


def _sorted_counts(scores: Array, labels: Array):
    """Sort desc (labels co-sorted in the same `lax.sort` — no argsort +
    random gather); cumulative tp/fp; distinct-score group-end mask.  Tie
    groups may internally reorder (unstable sort): every consumer only
    reads group-aggregate values, which are permutation-invariant.

    tps/fps are EXACT int32 cumulative counts: a float32 cumsum silently
    saturates past 2^24 elements (16777216.0f + 1.0f == 16777216.0f),
    which would corrupt AUC/AP/FPR on cohorts beyond ~16.7M voxels (a
    1000-slice TEST cohort at 256² already exceeds it).  Consumers cast
    to float only for final ratios, after exact integer differences."""
    scores = scores.ravel().astype(jnp.float32)
    labels_i = (labels.ravel() > 0).astype(jnp.int32)
    neg, li = jax.lax.sort((-scores, labels_i), num_keys=1)
    s = -neg
    tps = jnp.cumsum(li)
    fps = jnp.cumsum(1 - li)
    distinct = jnp.concatenate(
        [s[:-1] != s[1:], jnp.ones((1,), bool)])
    return s, tps, fps, distinct


def _prev_group_values(values: Array, distinct: Array) -> Array:
    """For each position, the value at the END of the PREVIOUS tie group
    (0 for the first group).

    Requires ``values`` monotone NON-DECREASING along the sorted order
    (true of tps/fps/tpr/fpr): the most recent preceding group-end value is
    then a shifted cummax over values masked to -1 off group ends — pure
    scan, no random gather.  Dtype-generic (exact on int32 counts)."""
    neg_one = jnp.asarray(-1, values.dtype)
    masked = jnp.where(distinct, values, neg_one)
    ends_before = jnp.concatenate(
        [jnp.full((1,), -1, values.dtype),
         jax.lax.cummax(masked)[:-1]])
    return jnp.where(ends_before < 0, jnp.zeros((), values.dtype),
                     ends_before)


def _roc_auc_from_counts(s, tps, fps, distinct) -> Array:
    # trapezoid segments from EXACT integer differences/sums (cancellation
    # between large nearby float ratios would otherwise dominate), one
    # float rounding per factor at the end
    tps_prev = _prev_group_values(tps, distinct)
    fps_prev = _prev_group_values(fps, distinct)
    seg = jnp.where(
        distinct,
        (fps - fps_prev).astype(jnp.float32)
        * (tps + tps_prev).astype(jnp.float32), 0.0)
    denom = tps[-1].astype(jnp.float32) * fps[-1].astype(jnp.float32)
    return jnp.sum(seg) * 0.5 / denom


def _average_precision_from_counts(s, tps, fps, distinct) -> Array:
    prec = tps.astype(jnp.float32) / jnp.maximum(tps + fps, 1).astype(
        jnp.float32)
    tps_prev = _prev_group_values(tps, distinct)
    seg = jnp.where(distinct,
                    (tps - tps_prev).astype(jnp.float32) * prec, 0.0)
    return jnp.sum(seg) / tps[-1].astype(jnp.float32)


def _precision_at_threshold_from_counts(s, tps, fps, distinct,
                                        target: float = 0.7) -> Array:
    """Exact sklearn-parity precision-``target`` operating threshold.

    Reproduces `utils/Evaluation.py:425-440`: the reference ran
    ``np.argmax(precisions <= 0.7)`` over sklearn's
    ``precision_recall_curve`` output (ascending-threshold order, truncated
    at the first full-recall point) and indexed ``thresholds`` with it.
    In this descending-score sweep, sklearn's curve corresponds to the
    distinct group-end positions with index <= the first full-recall group
    end; ascending-threshold index 0 is that full-recall position and the
    argmax picks the LOWEST threshold whose precision is <= target (falling
    back to index 0 — the full-recall threshold — when none is, matching
    numpy argmax-of-all-False semantics).
    """
    P = tps[-1]
    n = s.shape[0]
    prec = tps.astype(jnp.float32) / jnp.maximum(tps + fps, 1).astype(
        jnp.float32)
    full = distinct & (tps >= P)
    last_pos = jnp.argmax(full)  # first distinct position with full recall
    included = distinct & (jnp.arange(n) <= last_pos)
    ok = included & (prec <= target)
    j = jnp.where(jnp.any(ok), (n - 1) - jnp.argmax(ok[::-1]), last_pos)
    return s[j]


def precision70_threshold(scores: Array, labels: Array,
                          target: float = 0.7) -> Array:
    """Threshold at the precision<=target operating point (exact sweep)."""
    s, tps, fps, distinct = _sorted_counts(scores, labels)
    return _precision_at_threshold_from_counts(s, tps, fps, distinct, target)


def roc_auc(scores: Array, labels: Array) -> Array:
    """Exact AUROC with sklearn tie handling (`Metrics.py:45-64`)."""
    return _roc_auc_from_counts(*_sorted_counts(scores, labels))


def average_precision(scores: Array, labels: Array) -> Array:
    """sklearn ``average_precision_score``: sum over distinct thresholds of
    (R_n - R_{n-1}) * P_n (`Metrics.py:17-42`)."""
    return _average_precision_from_counts(*_sorted_counts(scores, labels))


def anomaly_curve_summary(scores: Array, labels: Array,
                          num_points: int = 256) -> Dict[str, Array]:
    """AUROC + AP + best-dice threshold + ROC/PRC curve samples from ONE
    sorted sweep (the eval pipeline's hot metric path — one O(N log N)
    sort instead of five)."""
    s, tps, fps, distinct = _sorted_counts(scores, labels)
    P = tps[-1]
    n = s.shape[0]

    dice_v = jnp.where(
        distinct,
        (2 * tps).astype(jnp.float32) / (tps + fps + P).astype(jnp.float32),
        -1.0)
    i = jnp.argmax(dice_v)
    nxt = jnp.where(i + 1 < n, s[jnp.minimum(i + 1, n - 1)], 0.0)

    pos = jnp.linspace(0, n - 1, num_points).astype(jnp.int32)
    return {
        "auc": _roc_auc_from_counts(s, tps, fps, distinct),
        "ap": _average_precision_from_counts(s, tps, fps, distinct),
        "best_dice": dice_v[i],
        "best_threshold": nxt,
        "precision70_threshold": _precision_at_threshold_from_counts(
            s, tps, fps, distinct),
        "roc": {"fpr": fps[pos] / fps[-1], "tpr": tps[pos] / P,
                "thresholds": s[pos]},
        "prc": {"precisions": tps[pos] / jnp.maximum(tps[pos] + fps[pos],
                                                     1.0),
                "recalls": tps[pos] / P, "thresholds": s[pos]},
        # dice-vs-threshold curve samples (dicePC.png parity,
        # `Evaluation.py:442-451`)
        "dice_curve": {"dice": 2.0 * tps[pos] / (tps[pos] + fps[pos] + P),
                       "thresholds": s[pos]},
    }


def _curve_samples(scores: Array, labels: Array, num_points: int):
    """One sorted sweep, sampled at ``num_points`` even positions along the
    sorted order — exact points of the empirical curve, O(N log N) total
    instead of num_points full-array rescans."""
    s, tps, fps, _ = _sorted_counts(scores, labels)
    n = s.shape[0]
    pos = jnp.linspace(0, n - 1, num_points).astype(jnp.int32)
    return s[pos], tps[pos], fps[pos], tps[-1], fps[-1]


def roc_curve_points(scores: Array, labels: Array, num_points: int = 256
                     ) -> Dict[str, Array]:
    """(fpr, tpr, thresholds) sampled along the sorted sweep for curve
    artifacts (rocPC.npy parity; the exact AUC comes from roc_auc)."""
    ts, tps, fps, P, N = _curve_samples(scores, labels, num_points)
    return {"fpr": fps / N, "tpr": tps / P, "thresholds": ts}


def prc_curve_points(scores: Array, labels: Array, num_points: int = 256
                     ) -> Dict[str, Array]:
    ts, tps, fps, P, _ = _curve_samples(scores, labels, num_points)
    prec = tps / jnp.maximum(tps + fps, 1.0)
    return {"precisions": prec, "recalls": tps / P, "thresholds": ts}


def best_dice_threshold(scores: Array, labels: Array) -> Tuple[Array, Array]:
    """Global-optimum (dice, threshold) over all cut points.

    Parity: `Metrics.py:110-162` searched an adaptive grid; this sweep
    covers every distinct score, so its optimum is >= the reference's and
    the reported threshold realises it under the reference's strict
    ``scores > t`` convention.
    """
    s, tps, fps, distinct = _sorted_counts(scores, labels)
    P = tps[-1]
    dice_v = (2 * tps).astype(jnp.float32) / (tps + fps + P).astype(
        jnp.float32)
    dice_v = jnp.where(distinct, dice_v, -1.0)
    i = jnp.argmax(dice_v)
    best = dice_v[i]
    # threshold: any t in [next distinct score, s_i) realises this cut under
    # "> t"; use the next distinct score (or 0 beyond the last group).
    n = s.shape[0]
    nxt = jnp.where(i + 1 < n, s[jnp.minimum(i + 1, n - 1)], 0.0)
    return best, nxt


def dice_at_threshold(scores: Array, labels: Array, t: Array) -> Array:
    return dice((scores > t).astype(jnp.float32), labels)


def segmented_confusion_stats(pred: Array, gt: Array, owners: Array,
                              n_patients: int) -> Dict[str, Array]:
    """Per-patient and global confusion counts in ONE dispatch.

    Replaces the reference's per-patient metric loop
    (`utils/Evaluation.py:461-491`) — which costs 3 host round trips per
    patient — with per-slice integer partial sums segment-summed by the
    slice's owning patient.  Counts are exact int32 (voxel counts are far
    below 2^31); every derived ratio (dice/precision/recall/TPR/FPR/VD) is
    a host-side division of these counts, identical in value to the
    reference formulas (`trainers/Metrics.py:67-107`).

    pred, gt: (S, ...) binary volumes; owners: (S,) int32 patient index per
    slice.  Returns per-patient TP / |P| / |G| vectors and global
    TP/FP/TN/FN.
    """
    S = pred.shape[0]
    p = (pred.reshape(S, -1) > 0.5)
    g = (gt.reshape(S, -1) > 0.5)
    tp_s = jnp.sum((p & g).astype(jnp.int32), axis=1)
    p_s = jnp.sum(p.astype(jnp.int32), axis=1)
    g_s = jnp.sum(g.astype(jnp.int32), axis=1)

    def seg(v: Array) -> Array:
        return jax.ops.segment_sum(v, owners, num_segments=n_patients)

    TP = jnp.sum(tp_s)
    P = jnp.sum(p_s)
    G = jnp.sum(g_s)
    total = jnp.int32(p.size)
    return {
        "per_tp": seg(tp_s), "per_p": seg(p_s), "per_g": seg(g_s),
        "TP": TP, "FP": P - TP, "FN": G - TP,
        "TN": total - P - G + TP,
    }


def combined_predictive_uncertainty(p: Array, sigmas: Array, axis: int = -1,
                                    log_var: bool = False) -> Array:
    """Kendall & Gal combined aleatoric+epistemic variance
    (`Metrics.py:170-173`)."""
    if log_var:
        sigmas = jnp.exp(sigmas)
    return (jnp.mean(jnp.square(p), axis=axis)
            - jnp.square(jnp.mean(p, axis=axis))
            + jnp.mean(sigmas, axis=axis))
