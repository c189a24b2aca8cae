"""From-scratch pure-Python BPE (Sennrich et al. 2016) used as the
independent reference for the distributed trainer.

The merge APPLY step is an explicit left-to-right pairwise list rewrite —
deliberately NOT the regex-replace strategy the engine uses — so a shared
misconception in the regex path (word-boundary anchoring, overlapping
repeats) cannot pass both sides unnoticed (ADVICE r5)."""

from __future__ import annotations

import collections
import re


def apply_merge(parts: list[str], lft: str, rgt: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge of (lft, rgt) in a
    symbol list — the canonical BPE within-word merge order."""
    out: list[str] = []
    i = 0
    while i < len(parts):
        if i + 1 < len(parts) and parts[i] == lft and parts[i + 1] == rgt:
            out.append(lft + rgt)
            i += 2
        else:
            out.append(parts[i])
            i += 1
    return out


def train(
    wcounts: dict[str, int], n_merges: int
) -> tuple[list[tuple], dict[str, str]]:
    """Vanilla sequential BPE on a word-count dictionary with the engine's
    tiebreak (count DESC, then 'lft|rgt' string ASC).  Returns the merge
    table rows and the final space-joined segmentation per word."""
    syms = {w: list(w) for w in wcounts}
    merges: list[tuple] = []
    for step in range(1, n_merges + 1):
        pair_counts: collections.Counter = collections.Counter()
        for w, c in wcounts.items():
            parts = syms[w]
            for a, b in zip(parts, parts[1:]):
                pair_counts[(a, b)] += c
        if not pair_counts:
            break
        (lft, rgt), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]}|{kv[0][1]}")
        )
        merges.append((step, lft, rgt, lft + rgt, cnt))
        for w in syms:
            syms[w] = apply_merge(syms[w], lft, rgt)
    return merges, {w: " ".join(p) for w, p in syms.items()}


def word_counts(texts: list[str]) -> dict[str, int]:
    """The trainer's pre-tokenizer: lowercase [a-z]+ runs, counted."""
    return collections.Counter(
        w for t in texts for w in re.findall("[a-z]+", t.lower())
    )
