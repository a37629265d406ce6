"""Surface-form normalization — the function that defines the blocking key.

Semantics match the reference's BasicTokenizer + lowercasing pipeline
(``entity_sort/utils/tokenization.py:137-247`` + ``main_dense.py:199-202``):
unicode NFD normalize, strip combining marks (accent removal), lowercase,
collapse whitespace. CJK text is preserved codepoint-for-codepoint (the
reference isolates CJK chars for BERT tokenization; for blocking-key
purposes the normalized surface keeps them contiguous so exact alias match
works on the full surface form, cf. ``el_main.py:122-127``).

Vectorized end-to-end with pyarrow.compute (re2 kernels) — no Python loop.
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa
import pyarrow.compute as pc

# re2 supports unicode property classes; \p{Mn} = nonspacing combining marks.
_COMBINING = r"\p{Mn}"
# Python str.split() whitespace = \t-\r, \x1c-\x1f, \x85 and all \p{Z};
# re2's \s is narrower, so spell the class out to keep the scalar and
# vectorized kernels byte-identical (property-tested).
_WHITESPACE = r"[\x09-\x0d \x1c-\x1f\x85\p{Z}]+"


def normalize_array(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Vectorized: NFD → strip combining marks → lowercase → trim/collapse ws."""
    out = pc.utf8_normalize(arr, form="NFD")
    out = pc.replace_substring_regex(out, _COMBINING, "")
    out = pc.utf8_lower(out)
    out = pc.replace_substring_regex(out, _WHITESPACE, " ")
    out = pc.utf8_trim_whitespace(out)
    return out


def normalize_str(s: str) -> str:
    """Scalar twin of :func:`normalize_array` (used by the driver-side oracle
    and index build; property-tested equal to the vectorized kernel)."""
    s = unicodedata.normalize("NFD", s)
    s = "".join(c for c in s if unicodedata.category(c) != "Mn")
    s = s.lower()
    return " ".join(s.split())
