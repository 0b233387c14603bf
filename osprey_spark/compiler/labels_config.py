"""Label config registration + compile-time validation.

ref: stdlib/configs/labels_config.py:27-47 (LabelInfo / LabelsConfig
— the ``labels`` config subkey of labels.yaml) and
ast_validator/validators/validate_labels.py:36-85 (ValidateLabels):
an unknown label in LabelAdd/LabelRemove/HasLabel is a compile error
with a closest-match hint, and a label applied to an entity type
outside its ``valid_for`` list is a compile error. Without a
registered config, any label string is accepted (the reference's
engine-only test harness behaves the same way — validation activates
with the config).

The closest-match hint mirrors utils/get_closest_string_within_
threshold.py: case-insensitive Levenshtein distance, threshold 3,
skipped for strings at or below threshold length. The DP below is a
from-scratch implementation of the textbook algorithm (the reference
uses the ``Levenshtein`` package, absent here).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, Mapping, Optional, Sequence, Union


@dataclass(frozen=True)
class LabelInfo:
    """ref: labels_config.py:27-30."""

    valid_for: tuple[str, ...] = ()
    connotation: str = "neutral"
    description: str = ""


_CONNOTATIONS = ("positive", "negative", "neutral")


@dataclass
class LabelsConfig:
    """The ``labels`` config subkey: label name → LabelInfo."""

    labels: dict[str, LabelInfo] = field(default_factory=dict)

    @classmethod
    def from_dict(
        cls, d: Mapping[str, Union[Mapping, Sequence[str], None]]
    ) -> "LabelsConfig":
        """Accepts the labels.yaml shape::

            {"spammer": {"valid_for": ["UserId"], "connotation": "negative"},
             "trusted": ["UserId", "GuildId"],   # shorthand: just valid_for
             "flagged": None}                    # no restrictions declared
        """
        labels: dict[str, LabelInfo] = {}
        for name, info in d.items():
            if info is None:
                labels[name] = LabelInfo()
            elif isinstance(info, Mapping):
                conn = str(info.get("connotation", "neutral"))
                if conn not in _CONNOTATIONS:
                    raise ValueError(
                        f"label {name!r}: connotation must be one of {_CONNOTATIONS}, got {conn!r}"
                    )
                labels[name] = LabelInfo(
                    valid_for=tuple(info.get("valid_for", ())),
                    connotation=conn,
                    description=str(info.get("description", "")),
                )
            else:
                labels[name] = LabelInfo(valid_for=tuple(info))
        return cls(labels=labels)


def levenshtein(a: str, b: str) -> int:
    """Textbook two-row DP edit distance."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def closest_within_threshold(
    string: str, candidates: Iterable[str], threshold: int = 3
) -> Optional[str]:
    """ref: utils/get_closest_string_within_threshold.py:7-23."""
    cands = list(candidates)
    if len(string) <= threshold or not cands:
        return None
    low = string.lower()
    best = min(cands, key=lambda s: levenshtein(low, s.lower()))
    return best if levenshtein(low, best.lower()) <= threshold else None
