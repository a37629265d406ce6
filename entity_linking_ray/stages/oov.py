"""Statistical OOV (new-word) mention discovery — the reference's HMM
channel re-expressed.

The reference falls back to a BMES character-tagging HMM Viterbi to cut
words its dictionary does not know (``my_jieba/finalseg/__init__.py:37-79``
— states B/M/E/S, transition topology B←E|S, M←M|B, E←B|M, S←S|E,
shipped emission tables). This module reimplements the algorithm (log-
space, vectorized over the 4 state rows; no code copied) and TRAINS the
tables from the KB alias lexicon instead of shipped corpora — so the
channel works from exactly the state the pipeline already broadcasts.

Two scripts, two signals (round-5 VERDICT #6 "capitalization+cohesion"):

- CJK runs: HMM-segmented; segments of length ≥ 2 absent from the
  lexicon become OOV proposals (the jieba new-word path).
- Spaced scripts: capitalized runs (the HeuristicNER proposer,
  stages/ner.py) absent from the lexicon, scored by COHESION — the
  minimum over adjacent token pairs of (c(a,b) − 1)/sqrt(c(a)·c(b))
  counted over the predict() input batch: a pair must RECUR to score at
  all (the −1 kills one-off adjacency), so names repeated across the
  batch pass while chance collocations drop below ``min_cohesion``.

Proposals feed the standard NER contract (``predict(sentences)`` →
``{"sentences", "mentions"}``), so :class:`..stages.ner.NERMentionStage`
ships them through the mentions schema unchanged; downstream they carry
no KB candidates and land as NIL singleton clusters instead of silence.
"""

from __future__ import annotations

import math
import re

import numpy as np

import ray

_MIN_LOG = -1e100  # "never" in log space (unseen emission / illegal move)
_CJK_RUN = re.compile(r"[一-鿿]{2,}")
_B, _M, _E, _S = 0, 1, 2, 3
# legal predecessors per state (the finalseg topology)
_PREV = {_B: (_E, _S), _M: (_M, _B), _E: (_B, _M), _S: (_S, _E)}


def train_bmes_from_lexicon(words) -> dict:
    """Emission/start/transition log-prob tables from character position
    statistics of a word list (the alias lexicon stands in for the
    reference's shipped corpus tables). Deterministic; smoothing is
    add-one over observed characters only."""
    emit = [dict(), dict(), dict(), dict()]
    n_single = n_multi = 0
    len_multi: list[int] = []
    for w in set(words):
        if not w:
            continue
        if len(w) == 1:
            n_single += 1
            emit[_S][w] = emit[_S].get(w, 0) + 1
        else:
            n_multi += 1
            len_multi.append(len(w))
            emit[_B][w[0]] = emit[_B].get(w[0], 0) + 1
            emit[_E][w[-1]] = emit[_E].get(w[-1], 0) + 1
            for ch in w[1:-1]:
                emit[_M][ch] = emit[_M].get(ch, 0) + 1
    total = max(n_single + n_multi, 1)
    log_emit = []
    for tbl in emit:
        z = sum(tbl.values()) or 1
        log_emit.append({ch: math.log(c / z) for ch, c in tbl.items()})
    # start: a sequence begins at a word start (B for multi, S for single)
    start = np.full(4, _MIN_LOG)
    if n_multi:
        start[_B] = math.log(n_multi / total)
    if n_single:
        start[_S] = math.log(n_single / total)
    # transitions from the word-length distribution:
    # B→E iff len==2, B→M iff len>2; a word of len L>2 has L-3 M→M and
    # one M→E; word ends (E, S) hand off to the next word's start
    trans = np.full((4, 4), _MIN_LOG)
    if n_multi:
        two = sum(1 for L in len_multi if L == 2)
        more = n_multi - two
        if two:
            trans[_B, _E] = math.log(two / n_multi)
        if more:
            trans[_B, _M] = math.log(more / n_multi)
        mm = sum(L - 3 for L in len_multi if L > 2)
        me = sum(1 for L in len_multi if L > 2)
        if mm + me:
            if mm:
                trans[_M, _M] = math.log(mm / (mm + me))
            if me:
                trans[_M, _E] = math.log(me / (mm + me))
    for end in (_E, _S):
        if n_multi:
            trans[end, _B] = math.log(n_multi / total)
        if n_single:
            trans[end, _S] = math.log(n_single / total)
    return {"start": start, "trans": trans, "emit": log_emit}


def viterbi_bmes(obs: str, model: dict) -> list[int]:
    """Most-likely BMES state path (log-space; ties resolved toward the
    lower state index, deterministically). Vectorized over the 4 states
    per step — the char loop is the algorithm's data dependency."""
    start, trans, emit = model["start"], model["trans"], model["emit"]
    T = len(obs)
    V = np.empty((T, 4))
    bp = np.zeros((T, 4), np.int8)
    e0 = np.array([emit[s].get(obs[0], _MIN_LOG) for s in range(4)])
    V[0] = start + e0
    for t in range(1, T):
        et = np.array([emit[s].get(obs[t], _MIN_LOG) for s in range(4)])
        for y in range(4):
            cand = [(V[t - 1][y0] + trans[y0, y], y0) for y0 in _PREV[y]]
            best = max(cand, key=lambda c: (c[0], -c[1]))
            V[t, y] = best[0] + et[y]
            bp[t, y] = best[1]
    last = _E if V[T - 1, _E] >= V[T - 1, _S] else _S
    path = [last]
    for t in range(T - 1, 0, -1):
        path.append(int(bp[t, path[-1]]))
    return path[::-1]


def cut_bmes(text: str, model: dict) -> list[tuple[int, int]]:
    """→ [(start, end)] word segments from the decoded state path (the
    __cut generator semantics: B opens, E closes, S is a singleton,
    trailing open runs flush)."""
    if not text:
        return []
    if len(text) == 1:
        return [(0, 1)]
    path = viterbi_bmes(text, model)
    out = []
    begin = 0
    nexti = 0
    for i, st in enumerate(path):
        if st == _B:
            begin = i
        elif st == _E:
            out.append((begin, i + 1))
            nexti = i + 1
        elif st == _S:
            out.append((i, i + 1))
            nexti = i + 1
    if nexti < len(text):
        out.append((nexti, len(text)))
    return out


class OOVMentionDetector:
    """NER predict() contract engine proposing mentions the lexicon does
    NOT know — the complement of the dictionary matcher, so unioning the
    channels never double-proposes a surface."""

    def __init__(self, lexicon, min_cohesion: float = 0.05,
                 min_len: int = 2):
        from ..functions.normalize import normalize_str

        self._norm = normalize_str
        self.lexicon = {normalize_str(w) for w in lexicon if w}
        self.model = train_bmes_from_lexicon(
            [w for w in self.lexicon if _CJK_RUN.fullmatch(w)]
            or [w for w in self.lexicon])
        self.min_cohesion = min_cohesion
        self.min_len = min_len

    def _cohesion(self, tokens: list[str], uni, bi) -> float:
        if len(tokens) < 2:
            return 1.0
        worst = 1.0
        for a, b in zip(tokens, tokens[1:]):
            pa_, pb = uni.get(a, 1), uni.get(b, 1)
            worst = min(worst,
                        (bi.get((a, b), 0) - 1) / math.sqrt(pa_ * pb))
        return max(worst, 0.0)

    def predict(self, sentences: list[str]) -> dict:
        from .ner import HeuristicNER

        # batch-level adjacency statistics for the cohesion score
        uni: dict[str, int] = {}
        bi: dict[tuple, int] = {}
        for sent in sentences:
            toks = [t.lower() for t in re.findall(r"[A-Za-z][A-Za-z'\-]*",
                                                  sent)]
            for t in toks:
                uni[t] = uni.get(t, 0) + 1
            for a, b in zip(toks, toks[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1

        mentions = []
        cap = HeuristicNER().predict(sentences)["mentions"]
        for m in cap:
            norm = self._norm(m["text"])
            if norm in self.lexicon or len(norm) < self.min_len:
                continue
            score = self._cohesion(norm.split(), uni, bi)
            if score < self.min_cohesion:
                continue
            mentions.append({**m, "score": float(score)})
        # CJK runs: HMM segmentation; unknown segments become proposals.
        # A run whose EVERY segment is unknown is one novel unit (a small
        # lexicon can only cut into shapes it has seen — proposing the
        # whole run beats emitting its arbitrary internal cuts).
        for sent_idx, sent in enumerate(sentences):
            for run in _CJK_RUN.finditer(sent):
                base, rtext = run.start(), run.group(0)
                segs = cut_bmes(rtext, self.model)
                known = [(s, e) for s, e in segs
                         if self._norm(rtext[s:e]) in self.lexicon]
                if not known and self._norm(rtext) not in self.lexicon:
                    if len(rtext) >= self.min_len:
                        mentions.append({
                            "sent_idx": sent_idx, "text": rtext,
                            "start_pos": base, "end_pos": base + len(rtext),
                            "score": 1.0,
                        })
                    continue
                for s, e in segs:
                    seg = rtext[s:e]
                    if e - s < self.min_len or self._norm(seg) in self.lexicon:
                        continue
                    mentions.append({
                        "sent_idx": sent_idx, "text": seg,
                        "start_pos": base + s, "end_pos": base + e,
                        "score": 1.0,
                    })
        mentions.sort(key=lambda m: (m["sent_idx"], m["start_pos"]))
        return {"sentences": sentences, "mentions": mentions}


def oov_mentions(docs: "ray.data.Dataset", lexicon,
                 min_cohesion: float = 0.05,
                 concurrency: int | tuple = 4,
                 batch_size: int = 256) -> "ray.data.Dataset":
    """OOV channel as a mentions-schema Dataset (NERMentionStage with the
    detector as its model factory; lexicon broadcast once via ray.put,
    detector built once per actor)."""
    from .ner import ner_mentions

    lex_ref = ray.put(sorted({w for w in lexicon if w}))

    def factory():
        return OOVMentionDetector(ray.get(lex_ref),
                                  min_cohesion=min_cohesion)

    return ner_mentions(docs, factory=factory, concurrency=concurrency,
                        batch_size=batch_size)
