"""mAP evaluation core (reference: validate_detector_map, src/additionally.c:4541-4898).

Exact reproduction of the reference's accounting:

* per-image decode at thresh=0.005, NMS 0.45 (do_nms_sort_v3 == do_nms_sort)
* every (detection, class) with prob>0 becomes a ranked record; matched to the
  best-IoU same-class truth above ``iou_thresh``; unmatched detections overlapping a
  "difficult" truth are dropped entirely
* TP/FP/avg-IoU at the CLI threshold with per-image truth-index dedupe
* global rank sweep with per-truth dedupe -> PR curves -> 11-point interpolated AP
  per class -> mAP

The detection records are produced by the caller (so the network/batching strategy is
decoupled); this module owns matching + curve math and the printed report.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..post.boxes import Detections, box_iou


@dataclass
class MapAccumulator:
    classes: int
    iou_thresh: float = 0.5
    thresh_calc_avg_iou: float = 0.25

    det_p: list = field(default_factory=list)
    det_class: list = field(default_factory=list)
    det_truth_flag: list = field(default_factory=list)
    det_truth_index: list = field(default_factory=list)

    unique_truth_count: int = 0
    truth_classes_count: np.ndarray = None
    avg_iou_sum: float = 0.0
    tp_for_thresh: int = 0
    fp_for_thresh: int = 0

    def __post_init__(self):
        self.truth_classes_count = np.zeros(self.classes, np.int64)

    def add_image(self, dets: Detections, truth: np.ndarray,
                  truth_dif: np.ndarray | None = None) -> None:
        """``truth``: [T,5] rows (class_id, x, y, w, h) relative; ``truth_dif``:
        difficult boxes, same layout. ``dets``: post-NMS detections (relative)."""
        truth = np.asarray(truth, np.float32).reshape(-1, 5)
        tboxes = truth[:, 1:5]
        tids = truth[:, 0].astype(np.int64)
        for tid in tids:
            self.truth_classes_count[tid] += 1
        dif = (np.asarray(truth_dif, np.float32).reshape(-1, 5)
               if truth_dif is not None else np.zeros((0, 5), np.float32))

        checkpoint_truth_indices: list = []
        if dets.n:
            iou_t = (box_iou(dets.bbox, tboxes) if len(tboxes) else
                     np.zeros((dets.n, 0)))
            iou_d = (box_iou(dets.bbox, dif[:, 1:5]) if len(dif) else
                     np.zeros((dets.n, 0)))
        for i in range(dets.n):
            for class_id in range(self.classes):
                prob = float(dets.prob[i, class_id])
                if prob <= 0:
                    continue
                # best same-class truth above iou_thresh
                truth_index = -1
                max_iou = 0.0
                for j in range(len(tboxes)):
                    cur = float(iou_t[i, j])
                    if cur > self.iou_thresh and class_id == tids[j] \
                            and cur > max_iou:
                        max_iou = cur
                        truth_index = self.unique_truth_count + j
                dropped = False
                if truth_index == -1:
                    # difficult overlap -> drop the ranked record, but the
                    # threshold-level FP accounting still runs (the reference's
                    # --detections_count at src/additionally.c:4745 does not skip
                    # the prob>thresh block at :4752-4765)
                    for j in range(len(dif)):
                        if (iou_d[i, j] > self.iou_thresh
                                and class_id == int(dif[j, 0])):
                            dropped = True
                            break
                if dropped:
                    if prob > self.thresh_calc_avg_iou:
                        self.fp_for_thresh += 1   # truth_index is -1 here
                    continue
                self.det_p.append(prob)
                self.det_class.append(class_id)
                self.det_truth_flag.append(1 if truth_index > -1 else 0)
                self.det_truth_index.append(truth_index)

                # threshold-level TP/FP with per-image dedupe
                # (reference: src/additionally.c:4751-4765)
                if prob > self.thresh_calc_avg_iou:
                    found = truth_index in checkpoint_truth_indices
                    if truth_index > -1 and not found:
                        self.avg_iou_sum += max_iou
                        self.tp_for_thresh += 1
                    else:
                        self.fp_for_thresh += 1
                checkpoint_truth_indices.append(truth_index)

        self.unique_truth_count += len(tboxes)

    def compute(self) -> dict:
        """Rank sweep + 11-point AP (reference: src/additionally.c:4779-4861)."""
        n = len(self.det_p)
        p = np.asarray(self.det_p, np.float32)
        cls = np.asarray(self.det_class, np.int64)
        tflag = np.asarray(self.det_truth_flag, np.int64)
        tidx = np.asarray(self.det_truth_index, np.int64)
        order = np.argsort(-p, kind="stable")

        truth_flags = np.zeros(max(1, self.unique_truth_count), np.int64)
        tp_c = np.zeros((n, self.classes), np.int64)
        fp_c = np.zeros((n, self.classes), np.int64)
        tp_run = np.zeros(self.classes, np.int64)
        fp_run = np.zeros(self.classes, np.int64)
        for rank, d in enumerate(order):
            # reference (src/additionally.c:4816-4826): a duplicate match of an
            # already-claimed truth counts NEITHER as TP nor FP
            if tflag[d] == 1:
                if truth_flags[tidx[d]] == 0:
                    truth_flags[tidx[d]] = 1
                    tp_run[cls[d]] += 1
            else:
                fp_run[cls[d]] += 1
            tp_c[rank] = tp_run
            fp_c[rank] = fp_run

        ap = np.zeros(self.classes)
        with np.errstate(divide="ignore", invalid="ignore"):
            if n:
                prec = np.where(tp_c + fp_c > 0, tp_c / (tp_c + fp_c), 0.0)
                denom = self.truth_classes_count[None, :]
                rec = np.where(denom > 0, tp_c / np.maximum(denom, 1), 0.0)
                for i in range(self.classes):
                    s = 0.0
                    for point in range(11):
                        cur_recall = point * 0.1
                        mask = rec[:, i] >= cur_recall
                        cur_prec = prec[mask, i].max() if mask.any() else 0.0
                        s += cur_prec
                    ap[i] = s / 11.0

        tp, fp = self.tp_for_thresh, self.fp_for_thresh
        avg_iou = self.avg_iou_sum / (tp + fp) if (tp + fp) > 0 else 0.0
        precision = tp / (tp + fp) if (tp + fp) > 0 else 0.0
        fn = self.unique_truth_count - tp
        recall = tp / (tp + fn) if (tp + fn) > 0 else 0.0
        f1 = (2 * precision * recall / (precision + recall)
              if (precision + recall) > 0 else 0.0)
        return {
            "ap": ap,
            "mAP": float(ap.mean()) if self.classes else 0.0,
            "detections_count": n,
            "unique_truth_count": self.unique_truth_count,
            "tp": tp, "fp": fp, "fn": fn,
            "precision": precision, "recall": recall, "f1": f1,
            "avg_iou": avg_iou,
        }


def read_truth_boxes(label_path: str) -> np.ndarray:
    """darknet label file: rows ``class x y w h`` relative
    (reference: read_boxes, src/additionally.c:4441-4469). Missing file -> empty."""
    try:
        rows = []
        with open(label_path) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 5:
                    rows.append([float(parts[0])] + [float(v) for v in parts[1:5]])
        return np.asarray(rows, np.float32).reshape(-1, 5)
    except FileNotFoundError:
        return np.zeros((0, 5), np.float32)


def label_path_for(image_path: str) -> str:
    """Path rewriting (reference: src/additionally.c:4668-4675): replace first
    'images'->'labels', 'JPEGImages'->'labels', extension -> .txt."""
    p = image_path.replace("images", "labels", 1)
    p = p.replace("JPEGImages", "labels", 1)
    for ext in (".jpg", ".png", ".bmp", ".JPG", ".JPEG"):
        if p.endswith(ext):
            p = p[: -len(ext)] + ".txt"
            break
    return p


def format_map_report(result: dict, names, iou_thresh: float,
                      thresh: float) -> str:
    """Reproduce the reference's printed block (src/additionally.c:4846-4895)."""
    lines = [f"detections_count = {result['detections_count']}, "
             f"unique_truth_count = {result['unique_truth_count']}  "]
    for i, a in enumerate(result["ap"]):
        name = names[i] if i < len(names) else str(i)
        lines.append(f"class_id = {i}, name = {name}, \t ap = {a * 100:2.2f} % ")
    lines.append(f" for thresh = {thresh:1.2f}, precision = "
                 f"{result['precision']:1.2f}, recall = {result['recall']:1.2f}, "
                 f"F1-score = {result['f1']:1.2f} ")
    lines.append(f" for thresh = {thresh:0.2f}, TP = {result['tp']}, "
                 f"FP = {result['fp']}, FN = {result['fn']}, "
                 f"average IoU = {result['avg_iou'] * 100:2.2f} % ")
    if iou_thresh == 0.5:
        lines.append(f"\n mean average precision (mAP) = {result['mAP']:f}, "
                     f"or {result['mAP'] * 100:2.2f} % ")
    else:
        lines.append(f"\n average precision (AP) = {result['mAP']:f}, "
                     f"or {result['mAP'] * 100:2.2f} % "
                     f"for IoU threshold = {iou_thresh:f} ")
    return "\n".join(lines)
