"""Pairwise similarity metrics (verification layer).

Set metrics mirror the reference's string_matchers.py:39-157 (Cosine, Dice,
Jaccard, GeneralizedJaccard, OverlapCoefficient over token sets); edit metrics
mirror matching.py:20-28 (Levenshtein, Jaro via py-stringcompare) but are
implemented here directly (pure Python / numpy; no external dep).

All functions are branch-stable: empty inputs return 0.0 except two empty sets
which compare equal (1.0) — matching set-semantics conventions used by the
reference's matchers.
"""

from __future__ import annotations

import numpy as np


def _inter_len(a: set, b: set) -> int:
    if len(a) > len(b):
        a, b = b, a
    return sum(1 for x in a if x in b)


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    i = _inter_len(a, b)
    return i / (len(a) + len(b) - i)


def dice(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return 2.0 * _inter_len(a, b) / (len(a) + len(b))


def cosine(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return _inter_len(a, b) / float(np.sqrt(len(a) * len(b)))


def overlap_coefficient(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return _inter_len(a, b) / min(len(a), len(b))


def generalized_jaccard(a: list, b: list) -> float:
    """Multiset Jaccard: sum(min counts) / sum(max counts)."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    mins = sum(min(ca[k], cb.get(k, 0)) for k in ca)
    maxs = sum(ca.values()) + sum(cb.values()) - mins
    return mins / maxs if maxs else 0.0


def levenshtein_sim(s1: str, s2: str) -> float:
    """1 - normalized Levenshtein distance."""
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    prev = np.arange(len(s2) + 1)
    cur = np.empty(len(s2) + 1, dtype=np.int64)
    arr2 = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)
    for i, c in enumerate(s1, 1):
        cur[0] = i
        cost = (arr2 != ord(c)).astype(np.int64)
        np.minimum(prev[1:] + 1, prev[:-1] + cost, out=cur[1:])
        # carry the insertion chain
        for j in range(1, len(s2) + 1):
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        prev, cur = cur, prev
    return 1.0 - prev[-1] / max(len(s1), len(s2))


def jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    match_dist = max(len(s1), len(s2)) // 2 - 1
    flags1 = [False] * len(s1)
    flags2 = [False] * len(s2)
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - match_dist), min(len(s2), i + match_dist + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags1[i] = flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i, f in enumerate(flags1):
        if f:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    m = matches
    return (m / len(s1) + m / len(s2) + (m - t) / m) / 3.0


def cosine_vectors(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


SET_METRICS = {
    "jaccard": jaccard,
    "dice": dice,
    "cosine": cosine,
    "overlap_coefficient": overlap_coefficient,
}
STRING_METRICS = {
    "levenshtein": levenshtein_sim,
    "jaro": jaro,
}
