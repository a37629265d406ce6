"""KB description synthesis (reference M7).

Reproduces the semantics of ``entity_sort/el_preprocess.py:124-164`` /
``el_main.py:130-161``: concatenate infobox ``predicate，object。`` pairs
under a character budget, with a first-pair truncation special case, and a
fallback description for entities with an empty infobox. The reference
recomputes this in three places; here it is computed once as a column.
"""

from __future__ import annotations

DEFAULT_BUDGET = 240
_FALLBACK = "摘要，{subject}无描述信息。"


def synthesize_description(subject: str, infobox: list[dict], budget: int = DEFAULT_BUDGET) -> str:
    """infobox = list of {"predicate": str, "object": str}."""
    if not infobox:
        return _FALLBACK.format(subject=subject)
    parts: list[str] = []
    used = 0
    for i, kv in enumerate(infobox):
        piece = f"{kv['predicate']}，{kv['object']}。"
        if used + len(piece) > budget:
            if i == 0:
                # first pair alone exceeds budget → hard-truncate it
                parts.append(piece[:budget])
            break
        parts.append(piece)
        used += len(piece)
    return "".join(parts) if parts else _FALLBACK.format(subject=subject)
