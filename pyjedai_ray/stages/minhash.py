"""MinHash / SimHash signature stage — the stateful actor-pool map_batches.

North-rule core (BASELINE.json): batched k-shingle MinHash signatures + LSH
band hashing computed in actor pools; SimHash for token-level similarity.
Reference analog: the tokenize-per-entity Ray path of block building
(src/pyjedai/block_building.py:385-406) — but vectorized per batch and with
per-actor one-time setup (permutation seeds) instead of per-call state.

Signer output schema (docs -> sigs):
  doc_id:int64, n_shingles:int32, shingles:list<uint64>,
  bands:list<uint64>[bands], simhash:uint64

``shingles`` carries the 64-bit shingle hashes so exact-Jaccard verification
never needs the original text (the text/html columns are projected away right
after signing — wide rows must not enter the shuffles, SURVEY.md §7).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..config import DedupConfig
from ..functions.hashing import (
    band_hashes,
    hash64,
    minhash_signature,
    perm_seeds,
    shingle_hash_array,
    simhash64,
)
from ..functions.tokenize import token_sequence


class MinHashSigner:
    """Callable class for ``map_batches(MinHashSigner, fn_constructor_kwargs=
    {"cfg": cfg}, concurrency=N, batch_size=B)`` — seeds built once per actor."""

    def __init__(self, cfg: DedupConfig | None = None, id_col: str = "doc_id", text_col: str = "text"):
        self.cfg = cfg or DedupConfig()
        self.id_col = id_col
        self.text_col = text_col
        self.seeds = perm_seeds(self.cfg.num_perms, self.cfg.seed)
        # per-actor token-hash caches (amortize across every batch this actor
        # ever sees; web vocab is heavy-tailed so hit rates are high)
        self._shingle_tok_cache: dict[str, int] = {}
        self._simhash_tok_cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        n = len(ids)
        shingle_lists: list[np.ndarray] = []
        sims = np.empty(n, dtype=np.uint64)
        sim_seed = cfg.seed ^ 0x51A4
        sim_cache = self._simhash_tok_cache
        for i, text in enumerate(texts):
            toks = token_sequence(text or "")
            shingle_lists.append(
                shingle_hash_array(toks, cfg.shingle_k, cfg.seed, self._shingle_tok_cache)
            )
            th = np.empty(0, dtype=np.uint64)
            if toks:
                distinct = set(toks)
                th = np.empty(len(distinct), dtype=np.uint64)
                for j, t in enumerate(distinct):
                    h = sim_cache.get(t)
                    if h is None:
                        h = hash64(t, sim_seed)
                        sim_cache[t] = h
                    th[j] = h
            sims[i] = simhash64(np.sort(th))
        sigs = np.empty((n, cfg.num_perms), dtype=np.uint64)
        for i, h in enumerate(shingle_lists):
            sigs[i] = minhash_signature(h, self.seeds)
        bands = band_hashes(sigs, cfg.bands, cfg.rows, cfg.seed)
        # NOTE: hash columns are bit-reinterpreted int64 — Ray's hash shuffle
        # and Arrow joins key natively on int64 but degrade uint64 to pickled
        # python objects.
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_shingles": pa.array([len(s) for s in shingle_lists], pa.int32()),
                # binary-encoded uint64 array: Acero joins carry binary payloads
                # but reject list<> payload columns
                "shingles": pa.array([s.tobytes() for s in shingle_lists], pa.binary()),
                "bands": pa.array([b.view(np.int64) for b in bands], pa.list_(pa.int64())),
                "simhash": pa.array(sims.view(np.int64), pa.int64()),
            }
        )


def sign(
    docs: ray.data.Dataset,
    cfg: DedupConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 1024,
    concurrency=None,
) -> ray.data.Dataset:
    """docs -> signature Dataset (actor pool when concurrency given)."""
    if concurrency is None:
        # actor pool sized to the node: leave 2 cpus for the driver/shuffle
        import ray

        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    return docs.map_batches(
        MinHashSigner,
        fn_constructor_kwargs={"cfg": cfg, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def explode_bands(sigs: ray.data.Dataset) -> ray.data.Dataset:
    """sigs -> (key:uint64, doc_id:int64), one row per LSH band. Vectorized
    flatten (bands are a fixed-width list column)."""

    def _explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        bands_col = batch["bands"].combine_chunks() if isinstance(batch["bands"], pa.ChunkedArray) else batch["bands"]
        flat = pc.list_flatten(bands_col)
        lens = pc.list_value_length(bands_col).to_numpy(zero_copy_only=False)
        rep_ids = np.repeat(ids, lens)
        return pa.table({"key": flat, "doc_id": pa.array(rep_ids, pa.int64())})

    return sigs.map_batches(_explode, batch_format="pyarrow")


def explode_simhash_bands(sigs: ray.data.Dataset, bands: int = 4) -> ray.data.Dataset:
    """sigs -> (key:uint64, doc_id:int64) Hamming-LSH chunks of the simhash:
    two docs within Hamming distance < bands share at least one chunk key."""

    def _explode(batch: pa.Table) -> pa.Table:
        # vectorized simhash_band_keys: (n, bands) chunk matrix in numpy
        # bit ops, no per-row Python (functions/hashing.py:165-171 semantics)
        sh = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(sh)
        if n == 0:
            return pa.table(
                {"key": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
            )
        width = np.uint64(64 // bands)
        mask = np.uint64((1 << (64 // bands)) - 1)
        i = np.arange(bands, dtype=np.uint64)
        keys = (i << np.uint64(60)) | ((sh[:, None] >> (i * width)) & mask)
        return pa.table(
            {"key": pa.array(keys.reshape(-1).view(np.int64), pa.int64()),
             "doc_id": pa.array(np.repeat(ids, bands), pa.int64())}
        )

    return sigs.map_batches(_explode, batch_format="pyarrow")
