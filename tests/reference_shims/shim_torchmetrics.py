"""Minimal `torchmetrics` shim: the reference imports only
ConfusionMatrix (testing.py:10) and uses update(preds, target) /
compute() (testing.py:457-458,483).  Semantics follow real torchmetrics'
multiclass confusion matrix: compute()[i, j] = count(target == i,
pred == j) — rows are ground truth, columns predictions.  (The
reference's in-code comment at testing.py:418 claims the transpose;
per the r4 FTS5 lesson we implement the library's executed behavior,
which downstream calculate_scores consumes.)
"""

import types

import torch


class ConfusionMatrix:
    def __init__(self, task="multiclass", num_classes=None, **kw):
        assert task == "multiclass" and num_classes
        self.num_classes = num_classes
        self.mat = torch.zeros((num_classes, num_classes),
                               dtype=torch.int64)

    def to(self, device):
        return self

    def update(self, preds, target):
        preds = preds.reshape(-1).long()
        target = target.reshape(-1).long()
        idx = target * self.num_classes + preds
        self.mat += torch.bincount(
            idx, minlength=self.num_classes ** 2
        ).reshape(self.num_classes, self.num_classes)

    def compute(self):
        return self.mat.clone()

    def reset(self):
        self.mat.zero_()


def build_modules():
    tm = types.ModuleType("torchmetrics")
    tm.ConfusionMatrix = ConfusionMatrix
    return {"torchmetrics": tm}
