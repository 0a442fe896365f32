"""PSN exactness: the distributed chunked-window implementation must equal a
single-process emulation of the same seeded algorithm — including pairs that
span chunk boundaries (forced with a tiny chunk_size)."""

import numpy as np
import pyarrow as pa


def _psn_oracle(edge_rows, max_window, seed):
    from pyjedai_ray.functions.hashing import hash64

    def mix(k, d):
        h = hash64(f"{k}|{d}", seed)
        return h - (1 << 64) if h >= (1 << 63) else h

    ordered = sorted(edge_rows, key=lambda r: (r[0], mix(r[0], r[1])))
    ids = [d for _, d in ordered]
    counts = {}
    for w in range(1, max_window + 1):
        for i in range(len(ids) - w):
            a, b = ids[i], ids[i + w]
            if a == b:
                continue
            key = (min(a, b), max(a, b))
            counts[key] = counts.get(key, 0) + 1
    return counts


def test_psn_matches_inmemory_oracle_across_boundaries(ray_session):
    import ray.data

    from pyjedai_ray.stages.meta_blocking import sorted_neighborhood_pairs

    rng = np.random.default_rng(3)
    keys, ids = [], []
    for i in range(400):
        # many docs per key and many keys per doc -> repeats at various gaps
        k = f"{'abcdefgh'[rng.integers(8)]}tok{rng.integers(40)}"
        keys.append(k)
        ids.append(int(rng.integers(60)))
    edges = ray.data.from_arrow(
        pa.table(
            {"key": pa.array(keys, pa.string()), "doc_id": pa.array(ids, pa.int64())}
        )
    ).repartition(7)

    got = {
        (r["id1"], r["id2"]): r["weight"]
        for r in sorted_neighborhood_pairs(
            edges, window=1, max_window=3, seed=42, chunk_size=8
        ).take_all()
    }
    want = _psn_oracle(list(zip(keys, ids)), max_window=3, seed=42)
    assert got == want
