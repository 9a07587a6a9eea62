"""Intersection-based evaluation: PSDS (polyphonic sound detection score).

Capability parity with ``sed_scores_eval.intersection_based.psds`` and
``intersection_based.reference.approximate_psds`` as used by the reference
(``models/base/tuning.py:701-718``,
``experiments/weak_label_crnn/inference.py:200-356``), plus
``utils.auc.staircase_auc``.

Semantics (PSDS, Bilen et al. 2020):
- DTC: a detection is valid if >= ``dtc_threshold`` of its duration
  intersects same-class ground truth; invalid detections are false
  positives.
- GTC: a ground-truth event is a true positive if >= ``gtc_threshold`` of
  its duration is covered by DTC-valid detections.
- CTTC: an invalid detection cross-triggers class c' if >=
  ``cttc_threshold`` of its duration intersects class-c' ground truth;
  cross-trigger rates are normalized by the total ground-truth duration of
  the triggered class and folded into the effective FPR with weight
  ``alpha_ct``.
- Per class: ROC of TPR vs effective FPR (per ``unit_of_time``) over the
  operating points; PSDS = area under the across-class mean TPR minus
  ``alpha_st`` times the across-class std, up to ``max_efpr``, normalized
  by ``max_efpr``.

Operating points: by default the EXACT set of all distinct score values
(change-point enumeration per class, matching sed_scores_eval); an
explicit grid can be passed via ``thresholds=`` —
:func:`approximate_psds` uses the official 50-threshold psds_eval-
compatible approximation.
"""
import numpy as np

from pb_sed_tpu.evaluation.scores import (
    event_list_from_score_array, validate_score_dataframe)

SECONDS_PER_UNIT = {'second': 1., 'minute': 60., 'hour': 3600.}

DEFAULT_THRESHOLDS = (np.arange(50) + .5) / 50


def staircase_auc(y, x, max_x=None):
    """Area under a right-continuous staircase y(x)."""
    y = np.asarray(y, dtype=float)
    x = np.asarray(x, dtype=float)
    order = np.argsort(x, kind='mergesort')
    x = x[order]
    y = y[order]
    if max_x is not None:
        keep = x <= max_x
        x = np.concatenate((x[keep], [max_x]))
        y = np.concatenate((y[keep], y[keep][-1:] if keep.any() else [0.]))
    widths = np.diff(x)
    return float(np.sum(widths * y[:-1]))


def _intersection(a_on, a_off, b_on, b_off):
    return max(0., min(a_off, b_off) - max(a_on, b_on))


def _counts_job(threshold, scores_arrays, ground_truth, classes,
                dtc_threshold, gtc_threshold, cttc_threshold,
                time_decimals):
    """parallel_map job: threshold first, shared data after."""
    return _counts_at_threshold(
        scores_arrays, ground_truth, classes, threshold,
        dtc_threshold, gtc_threshold, cttc_threshold, time_decimals)


def _class_counts(dets, gt_by_class, classes, ki, dtc_threshold,
                  gtc_threshold, cttc_threshold, rnd):
    """DTC/GTC/CTTC counting for one clip/class detection list.

    Returns (tp, fp, cts_row (k,)).
    """
    k = len(classes)
    c = classes[ki]
    refs = gt_by_class.get(c, [])
    valid = []
    fp = 0
    cts_row = np.zeros(k)
    for d_on, d_off in dets:
        d_on, d_off = rnd(d_on), rnd(d_off)
        dur = max(d_off - d_on, 1e-12)
        inter = sum(_intersection(d_on, d_off, r_on, r_off)
                    for r_on, r_off in refs)
        if inter / dur >= dtc_threshold:
            valid.append((d_on, d_off))
        else:
            fp += 1
            if cttc_threshold is not None:
                for kj, c2 in enumerate(classes):
                    if c2 == c:
                        continue
                    refs2 = gt_by_class.get(c2, [])
                    inter2 = sum(
                        _intersection(d_on, d_off, r_on, r_off)
                        for r_on, r_off in refs2)
                    if inter2 / dur >= cttc_threshold:
                        cts_row[kj] += 1
    tp = 0
    for r_on, r_off in refs:
        dur = max(r_off - r_on, 1e-12)
        if _union_intersection(valid, r_on, r_off) / dur >= gtc_threshold:
            tp += 1
    return tp, fp, cts_row


def _psds_clip_job(item, ground_truth, classes, dtc_threshold,
                   gtc_threshold, cttc_threshold, time_decimals):
    """Per-clip exact job: (tps, fps, cts...) staircase at every change
    point, per class. Returns per class: (levels, stats (U, 2+k),
    base (2+k,))."""
    from pb_sed_tpu.evaluation.changepoints import level_detections
    clip_id, arr, timestamps = item
    gt = ground_truth.get(clip_id, [])
    gt_by_class = {}
    for on, off, lb in gt:
        gt_by_class.setdefault(lb, []).append((on, off))
    rnd = lambda v: round(v, time_decimals)
    k = len(classes)
    out = []
    for ki in range(k):
        levels, detections = level_detections(arr[:, ki], timestamps)
        rows = []
        for dets in detections:
            tp, fp, cts_row = _class_counts(
                dets, gt_by_class, classes, ki, dtc_threshold,
                gtc_threshold, cttc_threshold, rnd)
            rows.append(np.concatenate(([tp, fp], cts_row)))
        base, stats = rows[0], rows[1:]
        out.append((levels,
                    np.asarray(stats, dtype=float).reshape(
                        len(levels), 2 + k),
                    np.asarray(base, dtype=float)))
    return out


def _counts_at_threshold(
        scores_arrays, ground_truth, classes, threshold,
        dtc_threshold, gtc_threshold, cttc_threshold, time_decimals):
    k = len(classes)
    tps = np.zeros(k)
    fps = np.zeros(k)
    cts = np.zeros((k, k))
    rnd = lambda v: round(v, time_decimals)
    for clip_id, (arr, timestamps) in scores_arrays.items():
        gt = ground_truth.get(clip_id, [])
        gt_by_class = {}
        for on, off, lb in gt:
            gt_by_class.setdefault(lb, []).append((on, off))
        detections = event_list_from_score_array(
            arr, timestamps, classes, threshold)
        det_by_class = {}
        for on, off, lb in detections:
            det_by_class.setdefault(lb, []).append((rnd(on), rnd(off)))
        for ki, c in enumerate(classes):
            dets = det_by_class.get(c, [])
            refs = gt_by_class.get(c, [])
            valid = []
            for d_on, d_off in dets:
                dur = max(d_off - d_on, 1e-12)
                inter = sum(
                    _intersection(d_on, d_off, r_on, r_off)
                    for r_on, r_off in refs)
                if inter / dur >= dtc_threshold:
                    valid.append((d_on, d_off))
                else:
                    fps[ki] += 1
                    # cross triggers of this invalid detection
                    if cttc_threshold is not None:
                        for kj, c2 in enumerate(classes):
                            if c2 == c:
                                continue
                            refs2 = gt_by_class.get(c2, [])
                            inter2 = sum(
                                _intersection(d_on, d_off, r_on, r_off)
                                for r_on, r_off in refs2)
                            if inter2 / dur >= cttc_threshold:
                                cts[ki, kj] += 1
            for r_on, r_off in refs:
                dur = max(r_off - r_on, 1e-12)
                covered = _union_intersection(valid, r_on, r_off)
                if covered / dur >= gtc_threshold:
                    tps[ki] += 1
    return tps, fps, cts


def _union_intersection(intervals, r_on, r_off):
    """Length of (union of intervals) ∩ [r_on, r_off]."""
    clipped = sorted(
        (max(on, r_on), min(off, r_off))
        for on, off in intervals if off > r_on and on < r_off)
    total = 0.
    cur_on = cur_off = None
    for on, off in clipped:
        if cur_off is None or on > cur_off:
            if cur_off is not None:
                total += cur_off - cur_on
            cur_on, cur_off = on, off
        else:
            cur_off = max(cur_off, off)
    if cur_off is not None:
        total += cur_off - cur_on
    return total


def psds(scores, ground_truth, audio_durations, *, dtc_threshold,
         gtc_threshold, cttc_threshold=None, alpha_ct=0., alpha_st=0.,
         unit_of_time='hour', max_efpr=100., time_decimals=6,
         thresholds=None, num_jobs=1):
    """Returns (psds_value, (efpr_grid, etpr_curve), classwise_rocs).

    Default (``thresholds=None``): EXACT per-class ROCs over ALL distinct
    score values (change-point enumeration, the reference's
    sed_scores_eval semantics). Pass an explicit threshold grid for the
    approximate path (:func:`approximate_psds` uses the official
    50-threshold grid).

    ``classwise_rocs``: {class: (tpr, efpr, thresholds)}.
    """
    from pathlib import Path
    if isinstance(ground_truth, (str, Path)):
        from pb_sed_tpu.evaluation.scores import read_ground_truth_events
        ground_truth = read_ground_truth_events(ground_truth)
    if isinstance(audio_durations, (str, Path)):
        from pb_sed_tpu.evaluation.scores import read_audio_durations
        audio_durations = read_audio_durations(audio_durations)
    classes = None
    scores_arrays = {}
    for clip_id in scores:
        timestamps, classes = validate_score_dataframe(
            scores[clip_id], classes)
        scores_arrays[clip_id] = (
            scores[clip_id][classes].to_numpy(), timestamps)
    k = len(classes)
    n_ref = np.zeros(k)
    t_ref = np.zeros(k)  # total gt duration per class (unit_of_time)
    unit = SECONDS_PER_UNIT[unit_of_time]
    for clip_id, gt in ground_truth.items():
        for on, off, lb in gt:
            if lb in classes:
                ki = classes.index(lb)
                n_ref[ki] += 1
                t_ref[ki] += (off - on) / unit
    dataset_duration = sum(audio_durations.values()) / unit

    def efpr_of(fps, cts):
        """cts: (..., k) cross-trigger counts of this class's invalid
        detections against every other class."""
        efpr = fps / max(dataset_duration, 1e-12)
        if alpha_ct > 0. and cttc_threshold is not None and k > 1:
            ctr = cts / np.maximum(t_ref, 1e-12)
            efpr = efpr + alpha_ct * ctr.sum(-1) / (k - 1)
        return efpr

    from pb_sed_tpu.evaluation.parallel import parallel_map
    classwise_rocs = {}
    if thresholds is None:
        # exact path: per-clip change-point staircases, delta-merged
        from pb_sed_tpu.evaluation.changepoints import (
            CurveAccumulator, representative_thresholds)
        items = [
            (clip_id, arr, timestamps)
            for clip_id, (arr, timestamps) in scores_arrays.items()
        ]
        contributions = parallel_map(
            _psds_clip_job, items,
            (ground_truth, classes, dtc_threshold, gtc_threshold,
             cttc_threshold, time_decimals),
            num_jobs=num_jobs)
        for ki, c in enumerate(classes):
            acc = CurveAccumulator(2 + k)
            for contrib in contributions:
                levels, stats, base = contrib[ki]
                acc.add(levels, stats, base)
            bps, curve = acc.merged()
            reps = representative_thresholds(bps)
            tpr = curve[:, 0] / max(n_ref[ki], 1)
            # own-class column of cts is always zero (no self triggers)
            efpr = efpr_of(curve[:, 1], curve[:, 2:])
            order = np.argsort(efpr, kind='mergesort')
            classwise_rocs[c] = (
                np.maximum.accumulate(tpr[order]), efpr[order],
                reps[order])
    else:
        thresholds = np.asarray(thresholds, dtype=float)
        tprs = np.zeros((len(thresholds), k))
        efprs = np.zeros((len(thresholds), k))
        all_counts = parallel_map(
            _counts_job, [float(t) for t in thresholds],
            (scores_arrays, ground_truth, classes, dtc_threshold,
             gtc_threshold, cttc_threshold, time_decimals),
            num_jobs=num_jobs)
        for ti, (tps, fps, cts) in enumerate(all_counts):
            tprs[ti] = tps / np.maximum(n_ref, 1)
            np.fill_diagonal(cts, 0.)
            efprs[ti] = efpr_of(fps, cts)
        classwise_rocs = _classwise_rocs_from_grid(
            tprs, efprs, thresholds, classes)

    value, (grid, etpr) = _psds_from_rocs(
        classwise_rocs, classes, alpha_st, max_efpr)
    return value, (grid, etpr), classwise_rocs


def _classwise_rocs_from_grid(tprs, efprs, thresholds, classes):
    """(T, K) tpr/efpr arrays over a shared threshold grid -> per-class
    ROC tuples (tpr monotone-staircase over efpr-sorted points)."""
    classwise = {}
    for ki, c in enumerate(classes):
        order = np.argsort(efprs[:, ki], kind='mergesort')
        classwise[c] = (
            np.maximum.accumulate(tprs[order, ki]),
            efprs[order, ki], thresholds[order])
    return classwise


def _psds_from_rocs(classwise_rocs, classes, alpha_st, max_efpr):
    """Across-class effective TPR over the union of efpr support points
    -> normalized staircase AUC."""
    k = len(classes)
    grid = np.unique(np.concatenate(
        [roc[1] for roc in classwise_rocs.values()] + [[0.]]))
    if max_efpr is not None:
        grid = np.concatenate((grid[grid < max_efpr], [max_efpr]))
    tpr_at = np.zeros((k, len(grid)))
    for ki, c in enumerate(classes):
        t, e, _ = classwise_rocs[c]
        # staircase value: max tpr among points with efpr <= g
        idx = np.searchsorted(e, grid, side='right') - 1
        tpr_at[ki] = np.where(idx >= 0, t[np.clip(idx, 0, None)], 0.)
    etpr = tpr_at.mean(0) - alpha_st * tpr_at.std(0)
    etpr = np.maximum(etpr, 0.)
    value = staircase_auc(etpr, grid, max_efpr) / max_efpr
    return value, (grid, etpr)


def psds_from_operating_points(operating_points, ground_truth,
                               audio_durations, *, dtc_threshold,
                               gtc_threshold, cttc_threshold=None,
                               alpha_ct=0., alpha_st=0.,
                               unit_of_time='hour', max_efpr=100.):
    """PSDS from explicit per-threshold detection event lists.

    Args:
        operating_points: {threshold: {clip_id: [(onset, offset, label)]}}.

    Used for the "from files" self-consistency check: detections written
    per threshold (``write_detections_for_multiple_thresholds``) are read
    back and must reproduce the in-memory PSDS
    (reference ``experiments/weak_label_crnn/inference.py:326-355``).
    """
    unit = SECONDS_PER_UNIT[unit_of_time]
    classes = sorted({
        label
        for detections in operating_points.values()
        for events in detections.values()
        for *_, label in events
    } | {label for gt in ground_truth.values() for *_, label in gt})
    k = len(classes)
    n_ref = np.zeros(k)
    t_ref = np.zeros(k)
    for gt in ground_truth.values():
        for on, off, label in gt:
            if label in classes:
                ki = classes.index(label)
                n_ref[ki] += 1
                t_ref[ki] += (off - on) / unit
    dataset_duration = sum(audio_durations.values()) / unit
    thresholds = sorted(operating_points.keys())
    tprs = np.zeros((len(thresholds), k))
    efprs = np.zeros((len(thresholds), k))
    rnd = lambda v: v  # detection TSVs carry already-rounded times
    for ti, thr in enumerate(thresholds):
        detections = operating_points[thr]
        tps = np.zeros(k)
        fps = np.zeros(k)
        cts = np.zeros((k, k))
        for clip_id, events in detections.items():
            gt = ground_truth.get(clip_id, [])
            gt_by_class = {}
            for on, off, lb in gt:
                gt_by_class.setdefault(lb, []).append((on, off))
            det_by_class = {}
            for on, off, lb in events:
                det_by_class.setdefault(lb, []).append((on, off))
            for ki in range(k):
                tp, fp, cts_row = _class_counts(
                    det_by_class.get(classes[ki], []), gt_by_class,
                    classes, ki, dtc_threshold, gtc_threshold,
                    cttc_threshold, rnd)
                tps[ki] += tp
                fps[ki] += fp
                cts[ki] += cts_row
        tprs[ti] = tps / np.maximum(n_ref, 1)
        efpr = fps / max(dataset_duration, 1e-12)
        if alpha_ct > 0. and cttc_threshold is not None and k > 1:
            ctr = cts / np.maximum(t_ref[None, :], 1e-12)
            np.fill_diagonal(ctr, 0.)
            efpr = efpr + alpha_ct * ctr.sum(-1) / (k - 1)
        efprs[ti] = efpr
    classwise = _classwise_rocs_from_grid(
        tprs, efprs, np.asarray(thresholds), classes)
    value, (grid, etpr) = _psds_from_rocs(
        classwise, classes, alpha_st, max_efpr)
    return value, (grid, etpr), classwise


def approximate_psds_from_detections_dir(
        detections_dir, ground_truth, audio_durations, *,
        dtc_threshold=.7, gtc_threshold=.7, cttc_threshold=None,
        alpha_ct=0., alpha_st=0., unit_of_time='hour', max_efpr=100.,
        thresholds=None, num_jobs=1):
    """Approximate PSDS re-computed from on-disk per-threshold detection
    TSVs (cross-check of the score-IO round trip)."""
    del num_jobs
    from pathlib import Path
    from pb_sed_tpu.evaluation.scores import read_ground_truth_events
    if isinstance(ground_truth, (str, Path)):
        ground_truth = read_ground_truth_events(ground_truth)
    operating_points = {}
    for tsv in sorted(Path(detections_dir).glob('*.tsv')):
        try:
            thr = float(tsv.stem)
        except ValueError:
            continue
        operating_points[thr] = read_ground_truth_events(tsv)
    return psds_from_operating_points(
        operating_points, ground_truth, audio_durations,
        dtc_threshold=dtc_threshold, gtc_threshold=gtc_threshold,
        cttc_threshold=cttc_threshold, alpha_ct=alpha_ct,
        alpha_st=alpha_st, unit_of_time=unit_of_time, max_efpr=max_efpr)


def approximate_psds(scores, ground_truth, audio_durations, *,
                     thresholds=None, dtc_threshold=.7, gtc_threshold=.7,
                     cttc_threshold=None, alpha_ct=0., alpha_st=0.,
                     unit_of_time='hour', max_efpr=100., num_jobs=1):
    """The psds_eval-compatible 50-threshold approximation
    (reference cross-check path, ``inference.py:326-355``).

    Returns (psds_value, (efpr_grid, etpr), classwise_rocs) like
    :func:`psds`."""
    if thresholds is None:
        thresholds = DEFAULT_THRESHOLDS
    return psds(
        scores, ground_truth, audio_durations,
        dtc_threshold=dtc_threshold, gtc_threshold=gtc_threshold,
        cttc_threshold=cttc_threshold, alpha_ct=alpha_ct,
        alpha_st=alpha_st, unit_of_time=unit_of_time, max_efpr=max_efpr,
        thresholds=thresholds, num_jobs=num_jobs)
