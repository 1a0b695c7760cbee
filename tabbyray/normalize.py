"""String normalization and distance primitives with PHP-parity semantics.

The normalization function is the canonicalization key for the
groupby shuffle that unifies subject nodes, so it is re-implemented
bit-for-bit from the reference (`components/CanonicalTableAnnotator.php:121-137`).
The Levenshtein distance replicates PHP's byte-oriented ``levenshtein()``
including the 255-byte limit (returns -1), because the reference compares
raw UTF-8 byte strings (scores C1, C2, C4, C5).
"""

from __future__ import annotations

import re
from functools import lru_cache

from .constants import ALL_URI_SECTIONS

# [^a-zA-Zа-яА-Я0-9\s] with the /i flag — the explicit class already
# contains both cases, so the flag is a no-op; note ё/Ё are NOT in а-я/А-Я
# and are therefore stripped, exactly as in PCRE.
_STRIP_RE = re.compile(r"[^a-zA-Zа-яА-Я0-9\s]")
# runs of whitespace except CR/LF -> one space
_WS_RE = re.compile(r"[^\S\r\n]+")


@lru_cache(maxsize=1 << 17)
def normalize_entry(entry: str) -> str:
    """Parity re-implementation of ``getNormalizedEntry``
    (components/CanonicalTableAnnotator.php:121-137).

    Steps: strip all chars except ASCII letters, Cyrillic а-яА-Я, digits
    and whitespace; collapse non-newline whitespace runs to one space;
    trim; lowercase (full Unicode, as mb_strtolower); uppercase the first
    character only if it is a single-byte ASCII letter (PHP ``ucfirst`` is
    byte-oriented and leaves a leading multi-byte Cyrillic char alone);
    replace spaces with underscores.

    The reference also runs a per-line space-padding regex
    (':127-128') whose effect is erased by the subsequent trim for
    single-line values; extracted cell text is always single-line here
    (the extractor collapses whitespace), so it is intentionally omitted.
    """
    if entry is None:
        return ""
    s = _STRIP_RE.sub("", str(entry))
    s = _WS_RE.sub(" ", s)
    s = s.strip()
    s = s.lower()
    if s and "a" <= s[0] <= "z":
        s = s[0].upper() + s[1:]
    return s.replace(" ", "_")


@lru_cache(maxsize=1 << 18)
def php_levenshtein(a: str, b: str) -> int:
    """PHP ``levenshtein()`` parity: byte-level DP over the UTF-8
    encodings, unit costs, and -1 when either side exceeds 255 bytes
    (the documented PHP limit). Used by C1/C2/C4/C5 scorers; the
    ``== 0`` check in context similarity therefore means byte equality
    (`components/CanonicalTableAnnotator.php:795`).
    """
    ba = a.encode("utf-8")
    bb = b.encode("utf-8")
    if len(ba) > 255 or len(bb) > 255:
        return -1
    if ba == bb:
        return 0
    if not ba:
        return len(bb)
    if not bb:
        return len(ba)
    if len(ba) < len(bb):
        ba, bb = bb, ba
    lb = len(bb)
    row = list(range(1, lb + 1))
    for i, ca in enumerate(ba):
        diag = i                      # row[-1] of previous row
        left = i + 1                  # row[0] of current row
        for j in range(lb):
            up = row[j]
            c = diag if ca == bb[j] else diag + 1
            if left + 1 < c:
                c = left + 1
            if up + 1 < c:
                c = up + 1
            row[j] = c
            left = c
            diag = up
    return row[-1]


@lru_cache(maxsize=1 << 17)
def strip_uri_prefix(uri: str) -> str:
    """M7: remove dbo:/dbr:/dbp: namespace prefixes before string
    comparison (`components/CanonicalTableAnnotator.php:226-230`)."""
    for section in ALL_URI_SECTIONS:
        uri = uri.replace(section, "")
    return uri


_NAME_SUBSTITUTIONS = (
    ("\\", "+SS-LS+"), ("/", "+SS-RS+"), ("*", "+SS-S+"), ("?", "+SS-Q+"),
    (":", "+SS-C+"), ('"', "+SS-QM+"), ("<", "+SS-LB+"), (">", "+SS-RB+"),
    ("|", "+SS-VL+"),
)


def encode_partition_name(name: str) -> str:
    """M4 analog of ``encodeFileName``
    (components/CanonicalTableAnnotator.php:80-92): make a string safe
    for use in manifest/partition paths. Same 9 substitutions."""
    for ch, tok in _NAME_SUBSTITUTIONS:
        name = name.replace(ch, tok)
    return name


def decode_partition_name(name: str) -> str:
    """Inverse of :func:`encode_partition_name`
    (components/CanonicalTableAnnotator.php:100-112)."""
    for ch, tok in _NAME_SUBSTITUTIONS:
        name = name.replace(tok, ch)
    return name


def normalize_batch(arr):
    """Vectorized Arrow rendering of :func:`normalize_entry` for the
    web-scale paths (anchor-text entity linking), where a per-string
    Python call per row would dominate the stage. Same steps on RE2
    kernels: strip ``[^a-zA-Zа-яА-Я0-9\\s]``, collapse non-newline
    whitespace runs, trim, full-Unicode lower, byte-``ucfirst`` only
    for an ASCII first letter, spaces -> underscores.

    Parity bound (property-tested): identical to ``normalize_entry``
    whenever the input's WHITESPACE is ASCII (space/tab/CR/LF). PCRE
    and Python ``\\s`` match Unicode whitespace; RE2's is ASCII-only,
    so exotic Unicode spaces are stripped here but kept (as spaces) by
    the scalar function. Crawl anchor text is whitespace-normalized
    upstream (``visible_text`` collapses to ASCII spaces), so the
    vectorized form is exact on its actual inputs.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    s = pc.cast(arr, pa.string())
    s = pc.replace_substring_regex(s, r"[^a-zA-Zа-яА-Я0-9\s]", "")
    s = pc.replace_substring_regex(s, r"[^\S\r\n]+", " ")
    s = pc.utf8_trim_whitespace(s)
    s = pc.utf8_lower(s)
    first = pc.utf8_slice_codeunits(s, 0, 1)
    rest = pc.utf8_slice_codeunits(s, 1, 1 << 30)
    is_ascii_alpha = pc.match_substring_regex(first, "^[a-z]$")
    s = pc.if_else(
        is_ascii_alpha,
        pc.binary_join_element_wise(pc.utf8_upper(first), rest, ""),
        s)
    return pc.replace_substring(s, " ", "_")
