"""Evaluation-time confusion-matrix metrics.

Re-implementation of the reference ``Evaluator`` (``mopa/data/utils/evaluate.py:4-84``)
in pure numpy (the reference used sklearn's ``confusion_matrix``; a bincount
is equivalent and dependency-free). -100 labels are remapped to an extra row
outside the matrix, exactly like the reference's ``num_classes`` trick.
"""

import numpy as np


class Evaluator(object):
    def __init__(self, class_names, labels=None):
        self.class_names = tuple(class_names)
        self.num_classes = len(class_names)
        self.labels = (np.arange(self.num_classes) if labels is None
                       else np.array(labels))
        assert self.labels.shape[0] == self.num_classes
        self.confusion_matrix = np.zeros((self.num_classes, self.num_classes))

    def update(self, pred_label, gt_label):
        pred = np.asarray(pred_label).flatten()
        gt = np.asarray(gt_label).flatten().copy()
        gt[gt == -100] = self.num_classes  # ignore bucket outside the matrix
        ok = (gt >= 0) & (gt < self.num_classes) & (pred >= 0) & (pred < self.num_classes)
        inds = self.num_classes * gt[ok] + pred[ok]
        cm = np.bincount(inds.astype(np.int64),
                         minlength=self.num_classes ** 2)
        self.confusion_matrix += cm.reshape(self.num_classes, self.num_classes)

    def batch_update(self, pred_labels, gt_labels):
        assert len(pred_labels) == len(gt_labels)
        for pred_label, gt_label in zip(pred_labels, gt_labels):
            self.update(pred_label, gt_label)

    @property
    def overall_acc(self):
        total = np.sum(self.confusion_matrix)
        return np.sum(np.diag(self.confusion_matrix)) / max(total, 1e-12)

    @property
    def overall_iou(self):
        class_iou = np.array(self.class_iou, copy=True)
        class_iou[np.isnan(class_iou)] = 0
        return float(np.mean(class_iou))

    @property
    def class_seg_acc(self):
        return [self.confusion_matrix[i, i] / max(np.sum(self.confusion_matrix[i]), 1e-12)
                for i in range(self.num_classes)]

    @property
    def class_iou(self):
        iou_list = []
        for i in range(self.num_classes):
            tp = self.confusion_matrix[i, i]
            union = (self.confusion_matrix[:, i].sum()
                     + self.confusion_matrix[i, :].sum() - tp)
            iou_list.append(float("nan") if union == 0 else tp / union)
        return iou_list

    def print_table(self):
        from tabulate import tabulate

        header = ["Class", "Accuracy", "IOU", "Total"]
        table = [
            [name, acc * 100, iou * 100, int(self.confusion_matrix[i].sum())]
            for i, (name, acc, iou) in enumerate(
                zip(self.class_names, self.class_seg_acc, self.class_iou))
        ]
        return tabulate(table, headers=header, tablefmt="psql", floatfmt=".2f")

    def save_table(self, filename):
        from tabulate import tabulate

        header = ("overall acc", "overall iou") + self.class_names
        table = [[self.overall_acc, self.overall_iou] + self.class_iou]
        with open(filename, "w") as f:
            f.write(tabulate(table, headers=header, tablefmt="tsv",
                             floatfmt=".5f", numalign=None, stralign=None))
