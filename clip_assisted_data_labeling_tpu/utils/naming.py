"""Naming helpers: uuid assignment and natural ("nautilus") sort.

The reference depends on natsort for case-insensitive natural ordering
(_0_prep_dataset.py:54-57, _3_label_images.py:17-19); this is a dependency-free
equivalent.
"""
from __future__ import annotations

import re
import uuid as _uuid

_SPLIT = re.compile(r"(\d+)")


def _natural_key(s: str):
    # isdecimal, not isdigit: only decimal digits parse with int() — isdigit
    # is also True for characters like '²'/'①' that \d never captured, so a
    # filename containing them crashed the sort with ValueError
    return tuple(
        int(part) if part.isdecimal() else part.casefold()
        for part in _SPLIT.split(s)
    )


def natural_sort(names: list[str]) -> list[str]:
    """Case-insensitive natural sort (digit runs compare numerically)."""
    return sorted(names, key=_natural_key)


def new_uuid() -> str:
    """uuid4 hex string, the reference's file identifier (_0_prep_dataset.py:89)."""
    return _uuid.uuid4().hex
