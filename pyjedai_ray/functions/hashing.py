"""Deterministic hashing: 64-bit string hashes, MinHash, LSH bands, SimHash.

This module defines OUR hash family (the "identical shingle/signature config"
the north rule pins — BASELINE.json). It is pure numpy + hashlib so the exact
same code runs in Ray workers and in the in-memory test oracle; recall parity
vs the oracle is then exact by construction (SURVEY.md §7 "hard parts").

Reference analog: token/q-gram blocking keys (src/pyjedai/block_building.py)
play the candidate-generation role MinHash bands play here; the reference has
no MinHash of its own, so the family below is specified from first principles
(splitmix64 mixing, Steele et al., public domain constants).
"""

from __future__ import annotations

import hashlib

import numpy as np

U64 = np.uint64
_MASK64 = U64(0xFFFFFFFFFFFFFFFF)


_SM_C0 = U64(0x9E3779B97F4A7C15)
_SM_C1 = U64(0xBF58476D1CE4E5B9)
_SM_C2 = U64(0x94D049BB133111EB)
_SM_S30, _SM_S27, _SM_S31 = U64(30), U64(27), U64(31)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 arrays (wrapping mul —
    silent for ARRAY operands, so no errstate guard; in-place ops on one
    scratch buffer keep the hot path allocation-light: this is the innermost
    kernel of shingle chaining, minhash and band folding)."""
    z = x.astype(U64, copy=True)
    z += _SM_C0
    t = z >> _SM_S30
    z ^= t
    z *= _SM_C1
    np.right_shift(z, _SM_S27, out=t)
    z ^= t
    z *= _SM_C2
    np.right_shift(z, _SM_S31, out=t)
    z ^= t
    return z


def _splitmix64_inplace(z: np.ndarray, t: np.ndarray) -> None:
    """splitmix64 finalizer applied IN PLACE to ``z`` with scratch ``t``
    (same shape/dtype) — zero allocations, for callers that loop the mixer
    many times over same-sized arrays (the per-permutation minhash pass).
    Bit-identical to ``splitmix64``."""
    z += _SM_C0
    np.right_shift(z, _SM_S30, out=t)
    z ^= t
    z *= _SM_C1
    np.right_shift(z, _SM_S27, out=t)
    z ^= t
    z *= _SM_C2
    np.right_shift(z, _SM_S31, out=t)
    z ^= t


def hash64(s: str, seed: int = 0) -> int:
    """Stable 64-bit hash of a string (blake2b keyed by seed)."""
    h = hashlib.blake2b(
        s.encode("utf-8"), digest_size=8, key=seed.to_bytes(8, "little")
    )
    return int.from_bytes(h.digest(), "little")


def hash64_array(strings: list[str], seed: int = 0) -> np.ndarray:
    """64-bit hashes for a list of strings -> uint64 array.

    hashlib's C core makes this ~1M/s per core; at larger scale swap in a
    vectorized hasher with the same contract (the seed pins the family).
    """
    key = seed.to_bytes(8, "little")
    blake2b = hashlib.blake2b
    return np.array(
        [
            int.from_bytes(blake2b(s.encode("utf-8"), digest_size=8, key=key).digest(), "little")
            for s in strings
        ],
        dtype=U64,
    )


def shingle_hash_array(
    tokens: list[str],
    k: int,
    seed: int = 0,
    token_cache: dict[str, int] | None = None,
) -> np.ndarray:
    """Sorted distinct 64-bit hashes of the k-token shingles of a token
    sequence (documents shorter than k hash as one whole-sequence shingle).

    THE shingle hash family of this engine (pinned by DedupConfig.seed): each
    distinct token is hashed once (blake2b, cached across calls via
    ``token_cache`` — per-actor state), then window hashes are a chained
    splitmix64 combine over the k token hashes. Fully vectorized over all
    windows; equivalent quality to hashing the joined shingle string at a
    fraction of the cost (token hashing amortizes across the corpus).
    """
    n = len(tokens)
    if n == 0:
        return np.array([], dtype=U64)
    if token_cache is None:
        token_cache = {}
    th = np.empty(n, dtype=U64)
    for i, t in enumerate(tokens):
        h = token_cache.get(t)
        if h is None:
            h = hash64(t, seed)
            token_cache[t] = h
        th[i] = h
    return shingle_hashes_from_token_hashes(th, k)


def shingle_hashes_from_token_hashes(th: np.ndarray, k: int) -> np.ndarray:
    """Windowed shingle hashes from a doc's ORDERED token-hash array — the
    chaining half of shingle_hash_array, split out so batch-level
    dictionary-encoded token hashing (stages/minhash.py) can reuse it
    bit-identically."""
    n = th.size
    if n == 0:
        return np.array([], dtype=U64)
    kk = min(k, n)
    acc = np.full(n - kk + 1, U64(0x243F6A8885A308D3) ^ np.uint64(kk), dtype=U64)
    for j in range(kk):
        acc = splitmix64(acc ^ th[j : j + n - kk + 1])
    return np.unique(acc)


def _segment_unique(
    values: np.ndarray, doc_rep: np.ndarray, n_docs: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-segment sorted-unique over a concatenated value array: one lexsort
    + run dedupe for the whole batch instead of n_docs np.unique calls.
    Returns (concatenated uniques, int64 offsets of length n_docs+1)."""
    if values.size == 0:
        return values, np.zeros(n_docs + 1, dtype=np.int64)
    order = np.lexsort((values, doc_rep))
    v, d = values[order], doc_rep[order]
    keep = np.ones(v.size, dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
    v, d = v[keep], d[keep]
    counts = np.bincount(d, minlength=n_docs)
    offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    return v, offs


def shingle_hashes_batched(
    th_all: np.ndarray, offs: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Batched shingle_hashes_from_token_hashes over a whole batch of docs:
    token hashes concatenated in ``th_all`` with per-doc ``offs``. The k
    chaining passes run over ONE array of all windows (masked for docs
    shorter than k) instead of one small call per doc — same values,
    ~k vector ops per batch. Returns per-doc sorted-unique window hashes
    (concatenated, with offsets)."""
    offs = np.asarray(offs, dtype=np.int64)
    n_docs = offs.size - 1
    lens = offs[1:] - offs[:-1]
    kk = np.minimum(lens, k)
    n_win = np.where(lens > 0, lens - kk + 1, 0)
    total = int(n_win.sum())
    if total == 0:
        return np.array([], dtype=U64), np.zeros(n_docs + 1, dtype=np.int64)
    doc_rep = np.repeat(np.arange(n_docs), n_win)
    win_offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_win, out=win_offs[1:])
    local = np.arange(total, dtype=np.int64) - win_offs[doc_rep]
    starts = offs[:-1][doc_rep] + local
    kkr = kk[doc_rep]
    acc = U64(0x243F6A8885A308D3) ^ kkr.astype(U64)
    for j in range(int(kk.max())):
        m = kkr > j
        if m.all():
            acc = splitmix64(acc ^ th_all[starts + j])
        else:
            idx = np.flatnonzero(m)
            acc[idx] = splitmix64(acc[idx] ^ th_all[starts[idx] + j])
    return _segment_unique(acc, doc_rep, n_docs)


def minhash_signatures_concat(
    sh: np.ndarray, offs: np.ndarray, seeds: np.ndarray
) -> np.ndarray:
    """(n_docs, num_perms) signatures from concatenated per-doc shingle
    hashes: one splitmix + minimum.reduceat pass per permutation over the
    whole batch (num_perms vector ops instead of n_docs matrix calls).
    Empty docs get the all-max sentinel (matches minhash_signature)."""
    offs = np.asarray(offs, dtype=np.int64)
    n_docs = offs.size - 1
    out = np.full((n_docs, seeds.shape[0]), _MASK64, dtype=U64)
    lens = offs[1:] - offs[:-1]
    ne = np.flatnonzero(lens > 0)
    if ne.size == 0:
        return out
    starts = offs[:-1][ne]
    # one xor + in-place mix + reduceat per permutation, over ONE pair of
    # scratch buffers: the mixer is the signer's innermost loop (num_perms
    # passes over every shingle in the batch), so the per-pass allocations
    # of the generic splitmix64 path measurably cost (~14% of the kernel)
    z = np.empty_like(sh)
    t = np.empty_like(sh)
    for i in range(seeds.shape[0]):
        np.bitwise_xor(sh, seeds[i], out=z)
        _splitmix64_inplace(z, t)
        out[ne, i] = np.minimum.reduceat(z, starts)
    return out


def simhash64_batched(th: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Batched simhash64 over concatenated per-doc (distinct-token) hash
    arrays: one unpackbits + add.reduceat for the whole batch. Empty docs
    hash to 0 (matches simhash64 on an empty array)."""
    offs = np.asarray(offs, dtype=np.int64)
    n_docs = offs.size - 1
    out = np.zeros(n_docs, dtype=U64)
    lens = offs[1:] - offs[:-1]
    ne = np.flatnonzero(lens > 0)
    if ne.size == 0 or th.size == 0:
        return out
    bits = np.unpackbits(
        np.ascontiguousarray(th).view(np.uint8).reshape(-1, 8),
        axis=1,
        bitorder="little",
    ).astype(np.int64)
    sums = np.add.reduceat(bits, offs[:-1][ne], axis=0)
    votes = sums * 2 - lens[ne][:, None]
    sel = (votes >= 0).astype(U64)
    out[ne] = (sel << np.arange(64, dtype=U64)[None, :]).sum(axis=1, dtype=U64)
    return out


def perm_seeds(num_perms: int, seed: int) -> np.ndarray:
    """The MinHash "permutations": num_perms fixed xor-seeds derived from the
    config seed by iterating splitmix64 (deterministic, order-stable)."""
    out = np.empty(num_perms, dtype=U64)
    state = np.array([seed], dtype=U64)
    for i in range(num_perms):
        state = splitmix64(state)
        out[i] = state[0]
    return out


def minhash_signature(shingle_hashes: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """MinHash signature: sig[i] = min over shingles of splitmix64(h ^ seed_i).

    Vectorized (num_perms x n_shingles) broadcast; empty input -> all-max
    sentinel signature (a doc with no shingles matches nothing).
    """
    if shingle_hashes.size == 0:
        return np.full(seeds.shape[0], _MASK64, dtype=U64)
    mixed = splitmix64(shingle_hashes[None, :] ^ seeds[:, None])
    return mixed.min(axis=1)


def band_hashes(signatures: np.ndarray, bands: int, rows: int, seed: int) -> np.ndarray:
    """LSH band keys: fold each band's r signature values into one uint64.

    signatures: (n_docs, bands*rows) -> (n_docs, bands) uint64. Chained
    splitmix64 over the rows, with a per-band initial state, so two docs share
    a band key iff all r minhashes in that band agree (up to 64-bit collision).
    """
    n = signatures.shape[0]
    sig = signatures.reshape(n, bands, rows)
    band_seed = perm_seeds(bands, seed ^ 0x5B4D5_1).astype(U64)
    acc = np.broadcast_to(band_seed, (n, bands)).copy()
    for r in range(rows):
        acc = splitmix64(acc ^ sig[:, :, r])
    return acc


def simhash64(token_hashes: np.ndarray, counts: np.ndarray | None = None) -> int:
    """64-bit SimHash over token hashes (optionally weighted by counts)."""
    if token_hashes.size == 0:
        return 0
    bits = (token_hashes[:, None] >> np.arange(64, dtype=U64)[None, :]) & U64(1)
    if counts is None:
        votes = bits.astype(np.int64).sum(axis=0) * 2 - token_hashes.size
    else:
        c = counts.astype(np.int64)
        votes = (bits.astype(np.int64) * c[:, None]).sum(axis=0) * 2 - c.sum()
    out = np.where(votes >= 0, U64(1), U64(0)) << np.arange(64, dtype=U64)
    return int(out.sum(dtype=U64))


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = (np.asarray(a, dtype=U64) ^ np.asarray(b, dtype=U64)).view(np.uint8)
    return np.unpackbits(x.reshape(-1, 8), axis=1).sum(axis=1)


def simhash_band_keys(simhash: int, bands: int = 4) -> list[int]:
    """Split a 64-bit simhash into `bands` chunks (Hamming-LSH: two hashes
    within distance bands-1 share at least one chunk). Keys namespaced by
    chunk index so chunk i only collides with chunk i."""
    width = 64 // bands
    mask = (1 << width) - 1
    return [(i << 60) | ((simhash >> (i * width)) & mask) for i in range(bands)]


def canonical_pair(a: int, b: int) -> tuple[int, int]:
    """Order a pair so id1 < id2 (reference utils.py:678-691 canonical_swap)."""
    return (a, b) if a < b else (b, a)


def pair_key(id1: np.ndarray, id2: np.ndarray) -> np.ndarray:
    """Single uint64 shuffle key for canonical pairs (id-space < 2^32) —
    used as the groupby key for pair dedup/weight aggregation."""
    lo = np.minimum(id1, id2).astype(np.uint64)
    hi = np.maximum(id1, id2).astype(np.uint64)
    return (lo << np.uint64(32)) | hi


def char_ngram_hashes(
    text: str, n: int = 48, sample_mod: int = 16, seed: int = 0
) -> np.ndarray:
    """Sorted distinct hashes of CONTENT-SELECTED character n-grams.

    The web-scale stand-in for suffix-array substring matching (north rule's
    long-text overlap detector): every n-char window is hashed (chained
    splitmix over the byte array — n vectorized passes, O(L*n/word) work) and
    a window is KEPT iff hash % sample_mod == 0. Selection depends only on
    window content, so two documents sharing a common run of
    >= n + n*sample_mod chars share a selected window with overwhelming
    probability regardless of its offset in either document (fixed-stride
    sampling would not survive shifts; this is the standard winnowing/
    mod-sampling trick from copy-detection literature).
    """
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    L = data.size
    if L == 0:
        return np.array([], dtype=U64)
    nn = min(n, L)
    with np.errstate(over="ignore"):
        acc = np.full(L - nn + 1, U64(seed) ^ U64(nn), dtype=U64)
        for j in range(nn):
            acc = splitmix64(acc ^ data[j : j + L - nn + 1].astype(U64))
    if L <= n:
        return np.unique(acc)
    kept = acc[acc % U64(sample_mod) == 0]
    if kept.size == 0:  # degenerate doc: keep the minimum window hash
        kept = acc.min(keepdims=True)
    return np.unique(kept)
