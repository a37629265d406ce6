"""Phonetic blocking keys — simplified American Soundex.

The classic record-linkage blocking family beside normalized-surface
hash, MinHash-LSH and sorted-neighborhood (reference analogue: the
alias normalization funnel, el_preprocess.py — phonetic keys are the
standard recall widener for misspelled surface forms). The variant here
is standard Soundex WITHOUT the H/W-transparency rule (adjacent equal
codes separated by H/W stay separate) — the common SQL formulation, so
the DuckDB oracle expresses the IDENTICAL key:

1. strip non-letters, uppercase;
2. code every letter: AEIOUHWY→0, BFPV→1, CGJKQSXZ→2, DT→3, L→4,
   MN→5, R→6;
3. collapse adjacent equal codes (including the first);
4. key = first LETTER + first 3 non-zero collapsed codes after the
   first position, right-padded with '0' ('000' for all-stripped
   strings, matching ``'' || '000'`` in SQL).

:func:`soundex_arrow` is the batch kernel — one 256-entry LUT gather
over the Arrow utf-8 data buffer plus offset arithmetic, no per-row
Python; :func:`soundex` is the scalar twin (property-tested equal).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import string_array_bytes

_MAP = "01230120022455012623010202"  # A..Z → code char

_LUT = np.zeros(256, np.uint8)
for _i, _c in enumerate(_MAP):
    _LUT[65 + _i] = ord(_c)


def soundex(s: str) -> str:
    """Scalar reference implementation (see module docstring)."""
    k = re.sub("[^A-Za-z]", "", s or "").upper()
    if not k:
        return "000"
    code = "".join(_MAP[ord(c) - 65] for c in k)
    collapsed = re.sub(r"(\d)\1+", r"\1", code)
    digits = collapsed[1:].replace("0", "")
    return k[0] + (digits + "000")[:3]


def soundex_arrow(arr) -> pa.Array:
    """Vectorized soundex over a pyarrow string array/chunked array.

    Cleaning runs as Arrow RE2 kernels; the code mapping is one LUT
    gather over the raw utf-8 buffer; run collapse, zero removal and
    digit ranking are offset arithmetic (segment boundaries protected
    by the is-start mask, so runs never collapse across rows)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    ks = pc.utf8_upper(pc.replace_substring_regex(
        arr, pattern="[^A-Za-z]", replacement=""))
    if isinstance(ks, pa.ChunkedArray):
        ks = ks.combine_chunks()
    data, offsets = string_array_bytes(ks)
    n = len(offsets) - 1
    if n == 0:
        return pa.array([], pa.string())
    lengths = np.diff(offsets)
    starts = offsets[:-1]
    ne = lengths > 0
    codes = _LUT[data]
    is_start = np.zeros(len(data), bool)
    is_start[starts[ne]] = True
    prev = np.empty_like(codes)
    if len(codes):
        prev[1:] = codes[:-1]
        prev[0] = 255
    keep = is_start | (codes != prev)
    # collapsed digit positions past each segment's first char
    dig = np.nonzero(keep & ~is_start & (codes != ord("0")))[0]
    seg_of = np.searchsorted(offsets, dig, side="right") - 1
    first_of_seg = np.searchsorted(seg_of, np.arange(n))
    rank = np.arange(len(dig), dtype=np.int64) - first_of_seg[seg_of]
    out = np.full((n, 4), ord("0"), np.uint8)
    out[ne, 0] = data[starts[ne]]
    sel = rank < 3
    out[seg_of[sel], 1 + rank[sel]] = codes[dig[sel]]
    # empty-after-cleaning rows emit the 3-char '000' (SQL parity)
    colmask = np.ones((n, 4), bool)
    colmask[~ne, 0] = False
    values = out[colmask]
    out_lens = np.where(ne, 4, 3).astype(np.int32)
    out_offsets = np.concatenate(
        [[np.int32(0)], np.cumsum(out_lens, dtype=np.int32)])
    return pa.Array.from_buffers(
        pa.string(), n,
        [None, pa.py_buffer(out_offsets.tobytes()),
         pa.py_buffer(values.tobytes())])


def soundex_sql_expr(col: str) -> str:
    """The DuckDB expression computing the IDENTICAL key — shared by
    every oracle over this blocking family. Adjacent-run collapse is
    one chained regexp_replace per digit (RE2 has no backreferences,
    so '(\\d)\\1+' would silently not match)."""
    k = f"upper(regexp_replace({col}, '[^A-Za-z]', '', 'g'))"
    code = f"translate({k}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{_MAP}')"
    collapsed = code
    for d in "0123456":
        collapsed = (f"regexp_replace({collapsed}, "
                     f"'{d}{d}+', '{d}', 'g')")
    digits = f"replace(substr({collapsed}, 2), '0', '')"
    return f"substr({k}, 1, 1) || substr({digits} || '000', 1, 3)"
