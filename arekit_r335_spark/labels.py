"""General label <-> uint scaling (the reference's ``BaseLabelScaler``,
``common/labels/scaler/base.py:6-84``: two ordered bijections label<->int and
label<->uint) plus the reference's concrete scalers:

* the 3-class sentiment scaler used by EP2 sample serialization
  (``common/labels/scaler/sentiment.py`` semantics: nolabel=0, pos=1, neg=2,
  with int form 0/+1/-1 and ``invert_label``);
* the 13-label SentiNeRel scaler (``contrib/source/sentinerel/
  labels_scaler.py:14-28``), uint = position in the ordered list.

Labels here are plain strings (the engine's columnar form of the reference's
identity-by-class Label objects — SURVEY.md §1 row 18)."""

from __future__ import annotations

from .sources.sentinerel import SENTINEREL_REL_LABELS


class LabelScaler:
    """Ordered label list -> bidirectional label<->uint maps; optional
    int map for signed sentiment arithmetic (A1 AVERAGE aggregation)."""

    def __init__(self, ordered_labels: list[str],
                 int_map: dict[str, int] | None = None):
        self.ordered = list(ordered_labels)
        self.label_to_uint = {l: i for i, l in enumerate(self.ordered)}
        self.uint_to_label = dict(enumerate(self.ordered))
        self.label_to_int = dict(int_map or self.label_to_uint)
        self.int_to_label = {v: k for k, v in self.label_to_int.items()}

    def to_uint(self, label: str) -> int:
        return self.label_to_uint[label]

    def to_label(self, uint: int) -> str:
        return self.uint_to_label[uint]

    def invert(self, label: str) -> str:
        """``SentimentLabelScaler.invert_label``: negate the int form."""
        return self.int_to_label[-self.label_to_int[label]]

    def uint_map(self) -> dict[str, int]:
        return dict(self.label_to_uint)


THREE_CLASS = LabelScaler(["nolabel", "pos", "neg"],
                          int_map={"nolabel": 0, "pos": 1, "neg": -1})

SENTINEREL = LabelScaler(list(SENTINEREL_REL_LABELS.values()))
