"""Mention extraction: interleaved documents → mentions table.

Reference semantics: dictionary (alias-table) mention extraction — jieba
user-dict segmentation + stop-word filter + first-occurrence positions
(``entity_sort/el_main.py:525-568``, ``service_main.py:108-134``; alias
table from ``el_process.py:19-44``, sorted by length desc = longest-match
priority ``el_process.py:65``). Re-expressed Ray-Data-first:

- The alias dictionary is broadcast once (``ray.put`` on the driver); each
  actor builds its matcher state (length-preserving normalization table +
  one compiled longest-first regex alternation) ONCE in ``__init__`` —
  the A8 "load user dict once per process" analogue.
- Matching runs per Arrow batch over the ``spans`` column; only
  ``kind == "text"`` spans are scanned; media spans pass through untouched.
- Offsets are char offsets (CJK-safe): the normalization used for matching
  is built to be length-preserving so match positions are valid in the
  ORIGINAL text (combining marks standalone map to a placeholder char).
- Word-boundary guards apply to alphanumeric-edged aliases only, so CJK
  aliases match inside unsegmented text (the jieba-replacement behavior).

Scale note: a compiled re2-style alternation is C-speed and fine up to
~10^4 aliases; for a 5.9M-alias KB (reference ``main_dense.py:119``) the
drop-in replacement is an Aho-Corasick automaton built in ``__init__`` from
the same broadcast alias list — the stage contract does not change.
"""

from __future__ import annotations

import re
import sys
import unicodedata

import numpy as np
import pyarrow as pa

import ray

from ..functions.normalize import normalize_str

CONTEXT_CHARS = 120
# reference stop-word filter analogue (el_main.py:534-537)
DEFAULT_STOPWORDS = frozenset(
    "the a an of and or to in is it on at by for with 的 了 在 是 和".split()
)
_PLACEHOLDER = "\x01"


def build_norm_table() -> dict[int, str]:
    """Length-preserving per-char normalization table for str.translate:
    accent-strip + lowercase where the NFD result is a single char; standalone
    combining marks map to a placeholder so offsets stay aligned."""
    table: dict[int, str] = {}
    for cp in range(0x09, 0x300):
        ch = chr(cp)
        if ch.isspace():
            if ch != " ":
                table[cp] = " "
            continue
        n = normalize_str(ch)
        if len(n) == 1 and n != ch:
            table[cp] = n
        elif len(n) == 0:
            table[cp] = _PLACEHOLDER
    for cp in range(0x300, 0x370):  # combining diacritics block
        table[cp] = _PLACEHOLDER
    for cp in range(0x1E00, 0x1F00):  # latin extended additional
        ch = chr(cp)
        n = normalize_str(ch)
        if len(n) == 1:
            table[cp] = n
    return table


class AliasMatcher:
    """Driver- or actor-side matcher state. Built once; applied per batch."""

    def __init__(self, aliases: list[str], stopwords=DEFAULT_STOPWORDS):
        self.norm_table = build_norm_table()
        norm = sorted(
            {normalize_str(a) for a in aliases} - set(stopwords) - {""},
            key=lambda s: (-len(s), s),
        )
        parts = []
        for a in norm:
            esc = re.escape(a)
            pre = r"(?<![0-9a-z])" if a[:1].isalnum() and ord(a[0]) < 0x2E80 else ""
            post = r"(?![0-9a-z])" if a[-1:].isalnum() and ord(a[-1]) < 0x2E80 else ""
            parts.append(f"{pre}{esc}{post}")
        self.pattern = re.compile("|".join(parts)) if parts else None

    def normalize_keep_length(self, text: str) -> str:
        out = text.translate(self.norm_table)
        if len(out) != len(text):  # rare multi-char expansions — per-char fallback
            out = "".join(
                (lambda n: n if len(n) == 1 else _PLACEHOLDER)(normalize_str(c)) for c in text
            )
        return out

    def find(self, text: str):
        """(start, end, norm_surface) matches in *text* (char offsets
        valid in the original string)."""
        return self.find_batch([text])[0]

    def find_batch(self, texts: list[str]):
        """Interface parity with HashAliasMatcher.find_batch. Direct list
        builds (a generator per text costs one frame resumption per
        match — measured ~30% of the scan on the bench corpus)."""
        pat = self.pattern
        if pat is None:
            return [[] for _ in texts]
        norm = self.normalize_keep_length
        return [[(m.start(), m.end(), m.group(0))
                 for m in pat.finditer(norm(t))] for t in texts]


_RK_BASE = 1099511628211  # odd → invertible mod 2^64
_RK_BASE_INV = pow(_RK_BASE, -1, 2 ** 64)
_GUARD_CHARS = frozenset("0123456789abcdefghijklmnopqrstuvwxyz")


def _prefix_state(codes: np.ndarray):
    """(B^i array, prefix sums of c[i]·B^-i) for O(1) window hashes.
    All arithmetic wraps mod 2^64 (numpy uint64 semantics)."""
    n = len(codes)
    with np.errstate(over="ignore"):
        b = np.full(n, np.uint64(_RK_BASE), dtype=np.uint64)
        if n:
            b[0] = np.uint64(1)
        bpow = np.cumprod(b, dtype=np.uint64)
        bi = np.full(n, np.uint64(_RK_BASE_INV), dtype=np.uint64)
        if n:
            bi[0] = np.uint64(1)
        binv_pow = np.cumprod(bi, dtype=np.uint64)
        s = np.cumsum(codes * binv_pow, dtype=np.uint64)
    return bpow, s


def _window_hashes(bpow: np.ndarray, s: np.ndarray, length: int) -> np.ndarray:
    """hash(i) of codes[i : i+length] for every start i (polynomial hash
    with exponents length-1..0), vectorized."""
    n = len(s)
    m = n - length + 1
    if m <= 0:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        hi = s[length - 1:]
        lo = np.concatenate(([np.uint64(0)], s[:m - 1]))
        return (bpow[length - 1:] * (hi - lo)).astype(np.uint64)


class HashAliasMatcher:
    """Scale engine for the alias dictionary: multi-pattern Rabin-Karp.

    The regex alternation engine is linear in alias COUNT at compile time
    and degrades past ~10^4 aliases; the reference operates a 5.9M-entity
    KB (``entity_candidate/main_dense.py:119``). This engine is sub-linear
    in alias count: per distinct alias LENGTH it computes all rolling
    window hashes of the batch text in one vectorized pass and membership-
    tests them against that length's sorted hash array (searchsorted —
    log |aliases|). Build is also vectorized (aliases of one length are
    concatenated and hashed at stride L). Matches are verified by exact
    string compare (hash collisions cannot produce false mentions), then
    resolved left-to-right longest-first — the same greedy semantics as
    the regex alternation (longest-sorted branches + finditer).

    Same contract as AliasMatcher: built once per actor, applied per
    batch; word-boundary guards for ASCII-alnum-edged aliases only, so
    CJK aliases match inside unsegmented text.
    """

    def __init__(self, aliases: list[str], stopwords=DEFAULT_STOPWORDS):
        self.norm_table = build_norm_table()
        norm = sorted({normalize_str(a) for a in aliases} - set(stopwords) - {""})
        by_len: dict[int, list[str]] = {}
        for a in norm:
            by_len.setdefault(len(a), []).append(a)
        # per length: hash-sorted parallel arrays (no Python dict — smaller
        # per-actor footprint at 10^6-10^7 aliases; hash collisions between
        # different aliases land adjacent and are resolved by exact compare)
        self.lengths: list[int] = sorted(by_len)
        self.hash_sorted: dict[int, np.ndarray] = {}
        self.alias_by_rank: dict[int, list[str]] = {}
        self.pre_by_rank: dict[int, np.ndarray] = {}
        self.post_by_rank: dict[int, np.ndarray] = {}
        for L, items in by_len.items():
            concat = "".join(items)
            codes = np.frombuffer(concat.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
            bpow, s = _prefix_state(codes)
            starts = np.arange(len(items), dtype=np.int64) * L
            with np.errstate(over="ignore"):
                hi = s[starts + L - 1]
                lo = np.where(starts > 0, s[np.maximum(starts - 1, 0)], np.uint64(0))
                hv = (bpow[starts + L - 1] * (hi - lo)).astype(np.uint64)
            order = np.argsort(hv, kind="stable")
            self.hash_sorted[L] = hv[order]
            self.alias_by_rank[L] = [items[i] for i in order]
            pre = np.array([bool(a[:1].isalnum() and ord(a[0]) < 0x2E80) for a in items])
            post = np.array([bool(a[-1:].isalnum() and ord(a[-1]) < 0x2E80) for a in items])
            self.pre_by_rank[L] = pre[order]
            self.post_by_rank[L] = post[order]

    def normalize_keep_length(self, text: str) -> str:
        out = text.translate(self.norm_table)
        if len(out) != len(text):
            out = "".join(
                (lambda n: n if len(n) == 1 else _PLACEHOLDER)(normalize_str(c)) for c in text
            )
        return out

    def find_batch(self, texts: list[str]):
        """list of texts → list of per-text [(start, end, norm_surface)].
        One vectorized hash pass per distinct alias length over the WHOLE
        batch (texts concatenated with a \\x00 separator that can never
        match an alias or pass a hash verify)."""
        if not self.lengths or not texts:
            return [[] for _ in texts]
        norms = [self.normalize_keep_length(t) for t in texts]
        concat = "\x00".join(norms)
        codes = np.frombuffer(concat.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        bpow, s = _prefix_state(codes)
        # doc start offset of each text in the concat string
        doc_starts = np.zeros(len(texts), dtype=np.int64)
        acc = 0
        for i, t in enumerate(norms):
            doc_starts[i] = acc
            acc += len(t) + 1

        # verify + boundary-guard candidates (hash hits are rare — the
        # Python loop below touches only actual near-matches)
        verified: list[tuple[int, int, str]] = []  # (global_start, length, alias)
        for L in self.lengths:
            hv = _window_hashes(bpow, s, L)
            if not len(hv):
                continue
            hs = self.hash_sorted[L]
            pos = np.searchsorted(hs, hv)
            np.clip(pos, 0, len(hs) - 1, out=pos)
            hits = np.nonzero(hs[pos] == hv)[0]
            aliases_l = self.alias_by_rank[L]
            pre_l, post_l = self.pre_by_rank[L], self.post_by_rank[L]
            for p in hits.tolist():
                j = int(pos[p])
                h = hv[p]
                # searchsorted is leftmost: scan the (rare) run of equal
                # hashes; exact compare rejects 64-bit collisions
                while j < len(hs) and hs[j] == h:
                    a = aliases_l[j]
                    if concat[p:p + L] == a:
                        if not (pre_l[j] and p > 0 and concat[p - 1] in _GUARD_CHARS) and \
                           not (post_l[j] and p + L < len(concat)
                                and concat[p + L] in _GUARD_CHARS):
                            verified.append((p, L, a))
                        break
                    j += 1

        out: list[list[tuple[int, int, str]]] = [[] for _ in texts]
        if not verified:
            return out
        # left-to-right, longest-first at equal start (regex alternation
        # order), non-overlapping
        verified.sort(key=lambda t: (t[0], -t[1]))
        cur_doc = -1
        cur_end = -1
        for p, L, a in verified:
            d = int(np.searchsorted(doc_starts, p, side="right") - 1)
            local = p - int(doc_starts[d])
            if local + L > len(norms[d]):
                continue  # window crossed the separator (possible only via
                # hash+compare of a '\x00'-containing alias — impossible, kept
                # as a safety net)
            if d != cur_doc:
                cur_doc, cur_end = d, -1
            if local < cur_end:
                continue
            out[d].append((local, local + L, a))
            cur_end = local + L
        return out

    def find(self, text: str):
        yield from self.find_batch([text])[0]


class MentionExtractor:
    """map_batches actor: documents(doc_id, spans) → mentions rows.

    ``aliases`` may be a list or a ``ray.ObjectRef`` to one (broadcast via
    ``ray.put`` — read zero-copy from the object store in every actor,
    never re-shipped per batch).

    ``engine``: "regex" (compiled alternation — measured fastest below a
    few hundred aliases: 6.9 vs 2.2 Mchar/s at 8 aliases), "hash"
    (multi-length Rabin-Karp — alias-count-insensitive: 2.0 Mchar/s at
    1k aliases ≈ 0.8 Mchar/s at 1M, vs regex already 30x slower at 1k;
    the 5.9M-alias scale path), or "auto" (hash above 512 aliases).
    """

    def __init__(self, aliases, stopwords=DEFAULT_STOPWORDS,
                 context_chars: int = CONTEXT_CHARS, engine: str = "auto"):
        if isinstance(aliases, ray.ObjectRef):
            aliases = ray.get(aliases)
        if engine == "auto":
            engine = "hash" if len(set(aliases)) > 512 else "regex"
        cls = HashAliasMatcher if engine == "hash" else AliasMatcher
        self.matcher = cls(aliases, stopwords=stopwords)
        self.context_chars = context_chars

    def __call__(self, batch: pa.Table) -> pa.Table:
        # span explode stays Arrow-side (flatten + field, no struct→dict
        # conversion); doc_id/span_idx/offset columns are gathered by
        # take/numpy; only the matcher scan and the mention/context
        # string slices run per match in Python
        import pyarrow.compute as pc

        cw = self.context_chars
        col = batch["spans"].combine_chunks()
        la = (col.chunk(0) if isinstance(col, pa.ChunkedArray)
              and col.num_chunks else
              col if isinstance(col, pa.Array) else
              pa.array([], batch.schema.field("spans").type))
        empty = pa.table({
            "doc_id": pa.array([], pa.string()),
            "span_idx": pa.array([], pa.int32()),
            "mention": pa.array([], pa.string()),
            "norm_mention": pa.array([], pa.string()),
            "context_left": pa.array([], pa.string()),
            "context_right": pa.array([], pa.string()),
            "offset": pa.array([], pa.int32()),
        })
        if len(la) == 0:
            return empty
        counts = pc.fill_null(pc.list_value_length(la), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = la.flatten()  # respects list offsets; drops null rows
        parent = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        row_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        span_idx = (np.arange(int(counts.sum()), dtype=np.int64)
                    - np.repeat(row_starts, counts))
        kind = flat.field("kind")
        text_a = flat.field("text")
        keep = pc.fill_null(
            pc.and_(pc.equal(kind, "text"),
                    pc.greater(pc.utf8_length(pc.fill_null(text_a, "")), 0)),
            False).to_numpy(zero_copy_only=False)
        sel = np.nonzero(keep)[0]
        if not len(sel):
            return empty
        sel_pa = pa.array(sel, pa.int64())
        texts = text_a.take(sel_pa).to_pylist()
        base = flat.field("offset").take(sel_pa) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        sp_parent, sp_idx = parent[sel], span_idx[sel]

        matches = self.matcher.find_batch(texts)
        n_m = np.fromiter((len(f) for f in matches), np.int64, len(matches))
        tot = int(n_m.sum())
        if tot == 0:
            return empty
        rep = np.repeat(np.arange(len(matches), dtype=np.int64), n_m)
        flatm = [x for f in matches for x in f]
        s_arr = np.fromiter((x[0] for x in flatm), np.int64, tot)
        e_l = [x[1] for x in flatm]
        s_l = s_arr.tolist()
        rep_l = rep.tolist()
        return pa.table({
            "doc_id": batch["doc_id"].take(
                pa.array(sp_parent[rep], pa.int64())),
            "span_idx": pa.array(sp_idx[rep].astype(np.int32), pa.int32()),
            "mention": pa.array(
                [texts[r][s:e] for r, s, e in zip(rep_l, s_l, e_l)],
                pa.string()),
            "norm_mention": pa.array([x[2] for x in flatm], pa.string()),
            "context_left": pa.array(
                [texts[r][s - cw if s > cw else 0:s]
                 for r, s in zip(rep_l, s_l)], pa.string()),
            "context_right": pa.array(
                [texts[r][e:e + cw] for r, e in zip(rep_l, e_l)],
                pa.string()),
            # pa.array validates the int64→int32 narrowing (ArrowInvalid
            # past 2^31-1) where .astype would wrap silently — a >2 Gi-
            # char document must fail loudly, not corrupt offsets
            "offset": pa.array(base[rep] + s_arr, pa.int32()),
        })


# worker-process-level matcher cache for the task-pool path: Ray reuses
# worker processes across tasks, so the matcher compiles once per worker —
# actor-pool amortization without actor-pool scheduling (ramp-up/starvation)
_TASK_MATCHERS: dict = {}


def extract_mentions(docs: "ray.data.Dataset", aliases: list[str],
                     concurrency: int | tuple = 4, batch_size: int = 256,
                     stopwords=DEFAULT_STOPWORDS,
                     pool: str = "actor") -> "ray.data.Dataset":
    """The pipeline stage: broadcast the alias list once; matcher state is
    built once per actor (default — amortized like the reference's
    load-once service process) or once per worker process with
    ``pool="task"`` (elastic tasks + worker-level cache; measured slower
    here because task-pool fusion serializes the stage chain)."""
    alias_ref = ray.put(list(aliases))

    if pool == "actor":
        if isinstance(concurrency, int):
            # a fixed-size pool can reserve every CPU and starve the task
            # operators (observed deadlock at num_cpus=4) — autoscale from 1
            concurrency = (1, max(1, concurrency))
        return docs.map_batches(
            MentionExtractor,
            fn_constructor_kwargs={"aliases": alias_ref, "stopwords": stopwords},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    key = alias_ref.hex() if hasattr(alias_ref, "hex") else str(alias_ref)

    def extract(batch: pa.Table) -> pa.Table:
        ext = _TASK_MATCHERS.get(key)
        if ext is None:
            ext = MentionExtractor(alias_ref, stopwords=stopwords)
            _TASK_MATCHERS.clear()
            _TASK_MATCHERS[key] = ext
        return ext(batch)

    return docs.map_batches(extract, batch_format="pyarrow", batch_size=batch_size)
