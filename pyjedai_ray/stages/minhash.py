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
    _segment_unique,
    band_hashes,
    hash64,
    minhash_signatures_concat,
    perm_seeds,
    shingle_hashes_batched,
    simhash64_batched,
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
        """Batch-level dictionary-encoded token hashing (VERDICT r2 #7):
        tokenize per doc (per-string work), then ONE Arrow dictionary encode
        over the whole batch's token stream, hash only the cache-missing
        distinct tokens (blake2b loop over uniques, not occurrences), and
        gather per-doc hash slices vectorized. Bit-identical to the per-row
        path (shingle chaining + per-doc distinct-token simhash unchanged)."""
        import pyarrow.compute as pc

        cfg = self.cfg
        ids = batch[self.id_col].to_pylist()
        n = len(ids)
        col = pc.fill_null(batch[self.text_col].combine_chunks(), "")
        if n and pc.all(pc.string_is_ascii(col)).as_py():
            # Arrow-vectorized token stream (same fast path + ASCII guard as
            # blocking._explode_standard: RE2's \W is ASCII-only, Python's is
            # Unicode-aware — non-ASCII batches take the per-doc loop below
            # for bit-identical token sequences). Document order and
            # duplicates preserved: list_flatten + stable filter.
            toks = pc.split_pattern_regex(pc.utf8_lower(col), "[\\W_]+")
            flat_pa = pc.list_flatten(toks)
            mask = pc.not_equal(flat_pa, "")
            par = pc.list_parent_indices(toks).filter(mask)
            flat_pa = flat_pa.filter(mask)
            lens = np.bincount(
                par.to_numpy(zero_copy_only=False).astype(np.int64), minlength=n
            ).astype(np.int64)
        else:
            tok_lists = [token_sequence(t or "") for t in col.to_pylist()]
            lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
            flat_pa = pa.array(
                [t for toks in tok_lists for t in toks], pa.string()
            )
        offs = np.concatenate([[0], np.cumsum(lens)])

        sim_seed = cfg.seed ^ 0x51A4
        if len(flat_pa):
            dic = flat_pa.dictionary_encode()
            uniq = dic.dictionary.to_pylist()
            indices = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            sh_cache = self._shingle_tok_cache
            sim_cache = self._simhash_tok_cache
            u_sh = np.empty(len(uniq), dtype=np.uint64)
            u_sim = np.empty(len(uniq), dtype=np.uint64)
            for j, t in enumerate(uniq):
                h = sh_cache.get(t)
                if h is None:
                    h = hash64(t, cfg.seed)
                    sh_cache[t] = h
                u_sh[j] = h
                h2 = sim_cache.get(t)
                if h2 is None:
                    h2 = hash64(t, sim_seed)
                    sim_cache[t] = h2
                u_sim[j] = h2
            sh_concat, sh_offs = shingle_hashes_batched(
                u_sh[indices], offs, cfg.shingle_k
            )
            # distinct TOKENS (not hashes): unique dictionary codes per doc
            # keep hash-collision multiplicity identical to the set(toks) path
            doc_rep = np.repeat(np.arange(n), lens)
            u_codes, sim_offs = _segment_unique(indices, doc_rep, n)
            sims = simhash64_batched(u_sim[u_codes], sim_offs)
        else:
            sh_concat = np.array([], dtype=np.uint64)
            sh_offs = np.zeros(n + 1, dtype=np.int64)
            sims = np.zeros(n, dtype=np.uint64)
        sigs = minhash_signatures_concat(sh_concat, sh_offs, self.seeds)
        bands = band_hashes(sigs, cfg.bands, cfg.rows, cfg.seed)
        sh_bytes = sh_concat.tobytes()
        n_shingles = (sh_offs[1:] - sh_offs[:-1]).astype(np.int32)
        # NOTE: hash columns are bit-reinterpreted int64 — Ray's hash shuffle
        # and Arrow joins key natively on int64 but degrade uint64 to pickled
        # python objects.
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_shingles": pa.array(n_shingles, pa.int32()),
                # binary-encoded uint64 array: Acero joins carry binary payloads
                # but reject list<> payload columns
                "shingles": pa.array(
                    [
                        sh_bytes[s * 8 : e * 8]
                        for s, e in zip(sh_offs[:-1], sh_offs[1:])
                    ],
                    pa.binary(),
                ),
                "bands": pa.array([b.view(np.int64) for b in bands], pa.list_(pa.int64())),
                "simhash": pa.array(sims.view(np.int64), pa.int64()),
            }
        )


def sign(
    docs: ray.data.Dataset,
    cfg: DedupConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 256,
    concurrency=None,
) -> ray.data.Dataset:
    """docs -> signature Dataset (actor pool when concurrency given).

    batch_size default measured at 640k docs / 32 cpus: 256 ≈ 128 < 512 <
    1024 < 2048 wall time — finer blocks pipeline better through the actor
    pool and bound straggler tasks on loaded hosts; the batched kernels
    amortize fully by ~256 rows."""
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
