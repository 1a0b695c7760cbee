"""Deterministic rule-based NER tagger.

The reference consumes Stanford-NER labels precomputed into the
`NER TAGS` sheet (`commands/SpreadsheetController.php:528-532`); our
web-scale input has no such sheet, so labels are produced by this
stage: literal types via compiled regexes, named-entity types via an
optional gazetteer (label -> NER label) built from the KB index. Pages
may also carry inline ``data-ner`` attributes (the direct analog of the
NER sheet); those take precedence in the extraction stage.

The tagger is a pure function of its inputs — same cell text in, same
label out — which keeps the pipeline deterministic under parallelism.
"""

from __future__ import annotations

import re
from typing import Mapping, Optional

from .constants import (
    DATE_NER_LABEL,
    MONEY_NER_LABEL,
    NONE_NER_LABEL,
    NUMBER_NER_LABEL,
    ORDINAL_NER_LABEL,
    PERCENT_NER_LABEL,
    TIME_NER_LABEL,
)
from .normalize import normalize_entry

_NUM = r"[+-]?\d{1,3}(?:[, ]\d{3})*(?:\.\d+)?|[+-]?\d+(?:\.\d+)?"
_RE_NUMBER = re.compile(rf"^(?:{_NUM})$")
_RE_ORDINAL = re.compile(r"^\d+(?:st|nd|rd|th)$", re.I)
_RE_PERCENT = re.compile(rf"^(?:{_NUM})\s?%$")
_RE_MONEY = re.compile(rf"^(?:[$€£¥]\s?(?:{_NUM})|(?:{_NUM})\s?(?:USD|EUR|GBP|RUB|\$|€|£))$")
_RE_DATE = re.compile(
    r"^(?:\d{4}-\d{2}-\d{2}"                      # ISO
    r"|\d{1,2}[/.]\d{1,2}[/.]\d{2,4}"             # 12/31/2020
    r"|(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\.?\s+\d{1,2},?\s+\d{4}"
    r"|\d{1,2}\s+(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\.?\s+\d{4}"
    r"|1[0-9]{3}|20[0-9]{2})$",                   # bare year
    re.I,
)
_RE_TIME = re.compile(r"^\d{1,2}:\d{2}(?::\d{2})?(?:\s?[AP]M)?$", re.I)


def tag_value(value: str, gazetteer: Optional[Mapping[str, str]] = None) -> str:
    """Assign one NER label from the reference vocabulary
    (`components/CanonicalTableAnnotator.php:27-37`) to a cell value."""
    v = (value or "").strip()
    if not v:
        return NONE_NER_LABEL
    if _RE_ORDINAL.match(v):
        return ORDINAL_NER_LABEL
    if _RE_PERCENT.match(v):
        return PERCENT_NER_LABEL
    if _RE_MONEY.match(v):
        return MONEY_NER_LABEL
    if _RE_TIME.match(v):
        return TIME_NER_LABEL
    if _RE_DATE.match(v):
        return DATE_NER_LABEL
    if _RE_NUMBER.match(v):
        return NUMBER_NER_LABEL
    if gazetteer is not None:
        hit = gazetteer.get(normalize_entry(v))
        if hit:
            return hit
    return NONE_NER_LABEL
