"""Tokenizers / blocking-key generators.

Semantics mirror the reference (cited file:line are in /root/reference):

* ``standard_tokens``      — src/pyjedai/block_building.py:503-512
  (``set(filter(None, re.split('[\\W_]', s.lower())))``)
* ``qgram_keys``           — src/pyjedai/block_building.py:545-562
  (char q-grams per token; tokens shorter than q kept whole)
* ``suffix_keys``          — src/pyjedai/block_building.py:599-618
  (all suffixes with length >= suffix_length; short tokens kept whole)
* ``extended_suffix_keys`` — src/pyjedai/block_building.py:655-675
  (token + all substrings with length in [suffix_length, len-1])
* ``extended_qgram_keys``  — src/pyjedai/block_building.py:714-773
  (combinations of >= ceil(threshold * L) q-grams, capped)
* ``word_shingles``        — our MinHash unit: k-word shingles over the
  standard token *sequence* (order preserving), the web-scale analog of
  QGramsBlocking keys.

All functions are pure and deterministic; outputs are sorted lists so that
downstream explode -> groupby results do not depend on set iteration order.
"""

from __future__ import annotations

import re
from itertools import combinations

_SPLIT_RE = re.compile(r"[\W_]+")


def standard_tokens(text: str) -> list[str]:
    """Distinct lowercase word tokens, sorted (reference keeps a set)."""
    return sorted(set(filter(None, _SPLIT_RE.split(text.lower()))))


def token_sequence(text: str) -> list[str]:
    """Lowercase word tokens in document order (duplicates kept)."""
    return [t for t in _SPLIT_RE.split(text.lower()) if t]


def qgram_keys(text: str, q: int = 6) -> list[str]:
    keys: set[str] = set()
    for token in standard_tokens(text):
        if len(token) < q:
            keys.add(token)
        else:
            for i in range(len(token) - q + 1):
                keys.add(token[i : i + q])
    return sorted(keys)


def suffix_keys(text: str, suffix_length: int = 6) -> list[str]:
    keys: set[str] = set()
    for token in standard_tokens(text):
        if len(token) < suffix_length:
            keys.add(token)
        else:
            for start in range(0, len(token) - suffix_length + 1):
                keys.add(token[start:])
    return sorted(keys)


def extended_suffix_keys(text: str, suffix_length: int = 6) -> list[str]:
    keys: set[str] = set()
    for token in standard_tokens(text):
        keys.add(token)
        if len(token) > suffix_length:
            for size in range(suffix_length, len(token)):
                for i in range(len(token) - size + 1):
                    keys.add(token[i : i + size])
    return sorted(keys)


def extended_qgram_keys(
    text: str, q: int = 6, threshold: float = 0.95, max_combination_size: int = 15
) -> list[str]:
    """Concatenated combinations of >= ceil(threshold*L) of a token's q-grams
    (reference caps combination count at MAX_QGRAMS=15)."""
    keys: set[str] = set()
    for token in standard_tokens(text):
        if len(token) < q:
            keys.add(token)
            continue
        grams = [token[i : i + q] for i in range(len(token) - q + 1)]
        if len(grams) == 1:
            keys.add(grams[0])
            continue
        if len(grams) > max_combination_size:
            grams = grams[:max_combination_size]
        minimum_length = max(1, int(round(len(grams) * threshold)))
        for size in range(minimum_length, len(grams) + 1):
            for combo in combinations(grams, size):
                keys.add("".join(combo))
    return sorted(keys)


def standard_multiset_tokens(text: str) -> list[str]:
    """Occurrence-numbered word tokens (bag semantics): the i-th occurrence
    of ``tok`` becomes ``tok#i``, so shared-key counts equal the multiset
    intersection. Reference analog: 'standard_multiset' (src/pyjedai/
    joins.py:190-197) — NOTE the reference iterates over ``set(...)`` there,
    which degenerates to set semantics with a "0" suffix; we implement the
    intended bag semantics and document the divergence."""
    counts: dict[str, int] = {}
    out: list[str] = []
    for tok in token_sequence(text):
        i = counts.get(tok, 0)
        out.append(f"{tok}#{i}")
        counts[tok] = i + 1
    return sorted(out)


def qgram_multiset_keys(text: str, q: int = 2) -> list[str]:
    """Occurrence-numbered per-token q-grams (bag semantics; see
    standard_multiset_tokens for the reference divergence note,
    joins.py:198-206)."""
    counts: dict[str, int] = {}
    out: list[str] = []
    for tok in token_sequence(text):
        grams = [tok] if len(tok) < q else [tok[i : i + q] for i in range(len(tok) - q + 1)]
        for g in grams:
            i = counts.get(g, 0)
            out.append(f"{g}#{i}")
            counts[g] = i + 1
    return sorted(out)


def flat_token_stream(col):
    """Batch tokenizer: ordered token stream of a string column as
    ``(flat_tokens: pa.Array, lens: np.ndarray[int64])`` — row i's tokens are
    ``flat[offs[i]:offs[i+1]]`` with ``offs = [0, cumsum(lens)]``.

    The engine's standard ASCII Arrow fast path (utf8_lower ->
    split_pattern_regex -> empty-filter; RE2's ``\\W`` is ASCII-only, so
    non-ASCII batches fall back to the per-row Python tokenizer for
    byte-identical tokens — same guard as the MinHash signer and the
    fingerprint batch path)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(col, pa.Array):
        col = col.combine_chunks()
    col = pc.fill_null(pc.cast(col, pa.string()), "")
    n = len(col)
    if n and pc.all(pc.string_is_ascii(col)).as_py():
        toks = pc.split_pattern_regex(pc.utf8_lower(col), "[\\W_]+")
        flat = pc.list_flatten(toks)
        mask = pc.not_equal(flat, "")
        par = pc.list_parent_indices(toks).filter(mask)
        flat = flat.filter(mask)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = np.bincount(
            par.to_numpy(zero_copy_only=False).astype(np.int64), minlength=n
        ).astype(np.int64)
        return flat, lens
    tok_lists = [token_sequence(t or "") for t in col.to_pylist()]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
    flat = pa.array([t for toks in tok_lists for t in toks], pa.string())
    return flat, lens


def word_shingles(text: str, k: int = 5) -> list[str]:
    """Distinct k-word shingles (space-joined) over the ordered token stream.

    Documents with fewer than k tokens produce a single whole-text shingle so
    short pages still get a key (cfg.min_tokens invariant).
    """
    toks = token_sequence(text)
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return sorted({" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)})


# registry used by the declarative pipeline spec and by __ray_entry__ queries
KEYERS = {
    "standard": standard_tokens,
    "qgrams": qgram_keys,
    "suffix": suffix_keys,
    "extended_suffix": extended_suffix_keys,
    "extended_qgrams": extended_qgram_keys,
    "standard_multiset": standard_multiset_tokens,
    "qgrams_multiset": qgram_multiset_keys,
    "shingle": word_shingles,
}
