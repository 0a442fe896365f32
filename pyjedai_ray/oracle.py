"""In-memory reference oracle (plain Python, single process).

Reimplements the dedup pipeline's semantics the way the reference computes
things — sequential loops over in-memory dicts (src/pyjedai/block_building.py
:442-453 dict build, comparison_cleaning.py per-entity loops, clustering.py
:431-475 connected components) — at the SAME shingle/signature config
(pyjedai_ray.config.DedupConfig pins seeds/bands). Tests assert the Ray
pipeline's clusters equal the oracle's exactly (dup-pair recall >= 0.99 is
then immediate; SURVEY.md §5 "reference-faithful in-memory oracle").
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from .config import DedupConfig
from .functions.hashing import (
    band_hashes,
    minhash_signature,
    perm_seeds,
    shingle_hash_array,
)
from .functions.tokenize import token_sequence
from .state.unionfind import UnionFind


def oracle_minhash_clusters(
    docs: list[tuple[int, str]], cfg: DedupConfig | None = None
) -> dict[int, int]:
    """(doc_id, text) list -> {doc_id: cluster_id} under MinHash-LSH +
    exact-Jaccard-verify + connected components, all in memory.

    Mirrors the Ray pipeline stage for stage, including the oversized-bucket
    chain rule (blocking.candidate_pairs), so results are bit-identical.
    """
    cfg = cfg or DedupConfig()
    seeds = perm_seeds(cfg.num_perms, cfg.seed)

    shingle_sets: dict[int, np.ndarray] = {}
    buckets: dict[int, list[int]] = defaultdict(list)
    token_cache: dict = {}
    for doc_id, text in docs:
        sh = shingle_hash_array(
            token_sequence(text or ""), cfg.shingle_k, cfg.seed, token_cache
        )
        shingle_sets[doc_id] = sh
        sig = minhash_signature(sh, seeds)[None, :]
        bands = band_hashes(sig, cfg.bands, cfg.rows, cfg.seed)[0]
        for b in bands:
            buckets[int(b)].append(doc_id)

    candidates: set[tuple[int, int]] = set()
    for ids in buckets.values():
        uniq = sorted(set(ids))
        if len(uniq) < 2:
            continue
        if len(uniq) <= cfg.max_block_size:
            for i in range(len(uniq)):
                for j in range(i + 1, len(uniq)):
                    candidates.add((uniq[i], uniq[j]))
        else:  # oversized bucket: consecutive-id chain (hot-key rule)
            for a, b in zip(uniq[:-1], uniq[1:]):
                candidates.add((a, b))

    uf = UnionFind()
    for a, b in candidates:
        sa, sb = shingle_sets[a], shingle_sets[b]
        if sa.size == 0 and sb.size == 0:
            j = 1.0
        elif sa.size == 0 or sb.size == 0:
            j = 0.0
        else:
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            j = inter / (sa.size + sb.size - inter)
        if j >= cfg.verify_threshold:
            uf.union(a, b)
    return uf.components()


def oracle_simhash_clusters(
    docs: list[tuple[int, str]],
    cfg: DedupConfig | None = None,
    simhash_bands: int = 4,
) -> dict[int, int]:
    """(doc_id, text) list -> {doc_id: cluster_id} under SimHash Hamming-LSH
    + Hamming-verify + connected components, all in memory.

    Mirrors stages/dedup.py:simhash_dedup stage for stage at the same seed
    (token hash seed = cfg.seed ^ 0x51A4, per stages/minhash.py signer),
    including the oversized-bucket chain rule, so results are bit-identical.
    """
    from .functions.hashing import hamming64, hash64, simhash64, simhash_band_keys

    cfg = cfg or DedupConfig()
    sim_seed = cfg.seed ^ 0x51A4

    simhashes: dict[int, int] = {}
    buckets: dict[int, list[int]] = defaultdict(list)
    for doc_id, text in docs:
        toks = token_sequence(text or "")
        th = np.array(
            sorted(hash64(t, sim_seed) for t in set(toks)), dtype=np.uint64
        )
        sh = simhash64(th)
        simhashes[doc_id] = sh
        for k in simhash_band_keys(sh, simhash_bands):
            buckets[int(k)].append(doc_id)

    candidates: set[tuple[int, int]] = set()
    for ids in buckets.values():
        uniq = sorted(set(ids))
        if len(uniq) < 2:
            continue
        if len(uniq) <= cfg.max_block_size:
            for i in range(len(uniq)):
                for j in range(i + 1, len(uniq)):
                    candidates.add((uniq[i], uniq[j]))
        else:  # oversized bucket: consecutive-id chain (hot-key rule)
            for a, b in zip(uniq[:-1], uniq[1:]):
                candidates.add((a, b))

    uf = UnionFind()
    for a, b in candidates:
        d = int(
            hamming64(
                np.array([simhashes[a]], dtype=np.uint64),
                np.array([simhashes[b]], dtype=np.uint64),
            )[0]
        )
        if d <= cfg.simhash_hamming_max:
            uf.union(a, b)
    return uf.components()


def oracle_pair_recall(
    oracle_clusters: dict[int, int], predicted_clusters: dict[int, int]
) -> tuple[float, int, int]:
    """Dup-pair recall of predicted vs oracle cluster assignments."""
    def pairs(assign: dict[int, int]) -> set[tuple[int, int]]:
        by = defaultdict(list)
        for d, c in assign.items():
            by[c].append(d)
        out = set()
        for v in by.values():
            v = sorted(v)
            for i in range(len(v)):
                for j in range(i + 1, len(v)):
                    out.add((v[i], v[j]))
        return out

    gt = pairs(oracle_clusters)
    pred = pairs(predicted_clusters)
    if not gt:
        return 1.0, 0, 0
    tp = len(gt & pred)
    return tp / len(gt), tp, len(gt)
