"""Clustering: similarity graph (pairs Dataset) -> cluster assignments.

Reference: src/pyjedai/clustering.py. The scalable path is connected
components (``ConnectedComponentsClustering``, :431-475) — our Dirty-ER dedup
clustering — implemented driver-side over the (small) verified edge list or
as distributed min-label propagation (state/unionfind.py) when edges are
large. Serial-greedy methods (UniqueMapping :477-539, Center :568-639,
BestMatch :641-727, MergeCenter :730-791) are order-dependent by definition;
they run driver-side over deterministically sorted edges (weight desc, id1,
id2), as the survey prescribes (§2.8: post-verification edges are small
relative to the corpus; these are CCER-only methods anyway).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..state.unionfind import UnionFind, label_propagation
from .exchange import hash_join

DRIVER_EDGE_LIMIT = 5_000_000


def connected_components(
    pairs: ray.data.Dataset,
    threshold: float | None = None,
    mode: str = "auto",
) -> ray.data.Dataset:
    """(id1, id2[, weight]) -> (doc_id, cluster_id=min id of component).

    mode: "driver" (union-find over collected edges), "distributed"
    (min-label propagation), or "auto" (driver below DRIVER_EDGE_LIMIT edges).
    Only nodes appearing in edges are emitted; singletons keep their own id
    implicitly (attach_clusters fills them in).
    """
    if threshold is not None and "weight" in pairs.columns():
        pairs = pairs.filter(expr=f"weight >= {threshold!r}")
    edges = pairs.select_columns(["id1", "id2"])
    if mode == "auto":
        mode = "driver" if edges.count() <= DRIVER_EDGE_LIMIT else "distributed"
    if mode == "distributed":
        return label_propagation(edges)

    uf = UnionFind()
    for batch in edges.iter_batches(batch_format="pyarrow"):
        for a, b in zip(
            batch["id1"].to_numpy(zero_copy_only=False),
            batch["id2"].to_numpy(zero_copy_only=False),
        ):
            uf.union(int(a), int(b))
    comp = uf.components()
    if not comp:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})
        )
    nodes = np.fromiter(comp.keys(), dtype=np.int64, count=len(comp))
    labels = np.fromiter(comp.values(), dtype=np.int64, count=len(comp))
    order = np.argsort(nodes)
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(nodes[order]), "cluster_id": pa.array(labels[order])})
    )


def attach_clusters(
    docs: ray.data.Dataset,
    clusters: ray.data.Dataset,
    id_col: str = "doc_id",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Left-join cluster ids onto the corpus; unmatched docs (singletons) get
    cluster_id = their own id."""
    from .exchange import probe_schema

    docs, dschema = probe_schema(docs)
    joined = hash_join(
        docs,
        clusters.rename_columns({"doc_id": id_col}),
        on=(id_col,),
        num_partitions=num_partitions,
        join_type="left outer",
        left_schema=dschema,
        right_schema=pa.schema([(id_col, pa.int64()), ("cluster_id", pa.int64())]),
    )

    def _fill(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if "cluster_id" not in batch.column_names:  # empty clusters side
            return batch.append_column("cluster_id", pc.cast(batch[id_col], pa.int64()))
        cid = batch["cluster_id"]
        own = batch[id_col]
        filled = pc.if_else(pc.is_null(cid), pc.cast(own, cid.type), cid)
        cols = {c: batch[c] for c in batch.column_names if c != "cluster_id"}
        cols["cluster_id"] = pc.cast(filled, pa.int64())
        return pa.table(cols)

    return joined.map_batches(_fill, batch_format="pyarrow")


def _sorted_edges(pairs: ray.data.Dataset) -> list[tuple[float, int, int]]:
    """Collect edges sorted by (weight desc, id1, id2) — deterministic greedy
    input order. Driver-side by design (see module docstring)."""
    rows = pairs.sort(["weight", "id1", "id2"], descending=[True, False, False]).take_all()
    return [(r["weight"], int(r["id1"]), int(r["id2"])) for r in rows]


def unique_mapping_clustering(
    pairs: ray.data.Dataset, threshold: float = 0.1
) -> ray.data.Dataset:
    """CCER greedy 1-1 matching (clustering.py:477-539): scan edges by
    descending weight, match a pair iff both endpoints are unmatched.
    Edges admitted with strict ``weight > threshold`` (reference :521)."""
    matched: set[int] = set()
    out1, out2 = [], []
    for w, a, b in _sorted_edges(pairs):
        if w <= threshold:
            break
        if a in matched or b in matched:
            continue
        matched.add(a)
        matched.add(b)
        out1.append(a)
        out2.append(b)
    t = pa.table({"id1": pa.array(out1, pa.int64()), "id2": pa.array(out2, pa.int64())})
    return ray.data.from_arrow(t)


def best_match_clustering(
    pairs: ray.data.Dataset, threshold: float = 0.1
) -> ray.data.Dataset:
    """Best candidate per source entity (clustering.py:641-727): for each id1
    keep its max-weight edge (deterministic tie-break id2 asc). Strict
    ``weight > threshold`` admission (reference :695)."""
    best: dict[int, tuple[float, int]] = {}
    for w, a, b in _sorted_edges(pairs):
        if w <= threshold:
            continue
        if a not in best:
            best[a] = (w, b)
    out1 = sorted(best)
    t = pa.table(
        {
            "id1": pa.array(out1, pa.int64()),
            "id2": pa.array([best[a][1] for a in out1], pa.int64()),
            "weight": pa.array([best[a][0] for a in out1], pa.float64()),
        }
    )
    return ray.data.from_arrow(t)


def merge_center_clustering(
    pairs: ray.data.Dataset, threshold: float = 0.1
) -> ray.data.Dataset:
    """MergeCenterClustering (clustering.py:730-791): center clustering
    WITHOUT weight normalization — the D1-side (smaller-id) endpoint of the
    first-seen edge becomes the center. A center-to-member edge where the
    member already belongs to ANOTHER center still lands in the output graph
    (reference :770-776 has no not-member guard), transitively MERGING the two
    clusters via connected components. Strict ``weight > threshold``
    (reference :758)."""
    from ..state.unionfind import UnionFind

    is_center: set[int] = set()
    is_member: set[int] = set()
    uf = UnionFind()
    for w, a, b in _sorted_edges(pairs):
        if w <= threshold:
            continue
        a_c, b_c = a in is_center, b in is_center
        a_m, b_m = a in is_member, b in is_member
        if not (a_c or b_c or a_m or b_m):
            is_center.add(a)
            is_member.add(b)
            uf.union(a, b)
        elif (a_c and b_c) or (a_m and b_m):
            continue
        elif a_c:
            is_member.add(b)
            uf.union(a, b)
        elif b_c:
            is_member.add(a)
            uf.union(a, b)
    comp = uf.components()
    nodes = sorted(comp)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(nodes, pa.int64()),
                "cluster_id": pa.array([comp[n] for n in nodes], pa.int64()),
            }
        )
    )


def markov_clustering(
    pairs: ray.data.Dataset,
    threshold: float = 0.5,
    cluster_threshold: float = 0.001,
    matrix_similarity_threshold: float = 1e-5,
    similarity_checks_limit: int = 10,
) -> ray.data.Dataset:
    """Markov Clustering (reference clustering.py:1055-1171): random-walk
    matrix over the similarity graph, alternating expansion (matrix square —
    the reference names this step ``inflate``) and elementwise-square
    inflation (its ``expand``), column-normalized, to equilibrium; final
    entries > cluster_threshold become edges whose connected components are
    the clusters.

    Driver-side dense numpy over the OBSERVED node set (the reference builds
    an n_entities x n_entities scipy matrix; singletons outside the graph are
    equivalent — they are diagonal-only and come back as implicit
    singletons via attach_clusters). Runs on the post-verification edge list,
    which is small relative to the corpus (module docstring)."""
    edges = _sorted_edges(pairs)
    admitted = [(w, a, b) for w, a, b in edges if w > threshold]
    nodes = sorted({n for _, a, b in admitted for n in (a, b)})
    if not nodes:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})
        )
    idx = {n: i for i, n in enumerate(nodes)}
    k = len(nodes)
    S = np.zeros((k, k), dtype=np.float64)
    for w, a, b in admitted:
        S[idx[a], idx[b]] = w
        S[idx[b], idx[a]] = w
    np.fill_diagonal(S, 1.0)  # set_node_loop(1.0), reference :1130-1134

    def _normalize(m: np.ndarray) -> np.ndarray:
        cs = m.sum(axis=0)
        cs[cs == 0] = 1.0
        return m / cs

    S = _normalize(S)
    for _ in range(similarity_checks_limit):
        prev = S
        S = _normalize(S @ S)   # reference inflate() = matrix dot, :1146
        S = _normalize(S * S)   # reference expand() = elementwise square, :1143
        shared = (S != 0) & (prev != 0)
        if np.all(np.abs(S[shared] - prev[shared]) <= matrix_similarity_threshold):
            break

    uf = UnionFind()
    # max over both orientations decides admission (reference :1114-1126)
    final = np.maximum(S, S.T)
    iu, ju = np.nonzero(np.triu(final, k=1) > cluster_threshold)
    for i, j in zip(iu, ju):
        uf.union(nodes[i], nodes[j])
    comp = uf.components()
    out_nodes = sorted(comp)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(out_nodes, pa.int64()),
                "cluster_id": pa.array([comp[n] for n in out_nodes], pa.int64()),
            }
        )
    )


def kiraly_clustering(
    pairs: ray.data.Dataset, threshold: float = 0.1
) -> ray.data.Dataset:
    """Kiraly MSM approximate clustering (reference clustering.py:1173-1341,
    CCER-only). Candidate edges start ACTIVE (:109), so the reference's
    single free-men pass reduces to: each D1 entity ("man", id1 side), in
    ascending id order, proposes once to its best candidate (similarity
    desc, id2 asc — the reference's tie order is insertion-dependent; we pin
    a total order, SURVEY.md §7); a D2 entity accepts when free or when the
    new suitor's similarity is STRICTLY higher (:1322-1341), leaving the
    jilted man unmatched (the reference never re-queues him, :1246-1262).
    Matched pairs' connected components are the clusters."""
    best: dict[int, list[tuple[float, int]]] = {}
    woman_scores: dict[tuple[int, int], float] = {}
    for w, a, b in _sorted_edges(pairs):
        if w <= threshold:
            continue
        best.setdefault(a, []).append((w, b))
        woman_scores[(b, a)] = w
    fiance: dict[int, int] = {}
    for man in sorted(best):
        cands = sorted(best[man], key=lambda t: (-t[0], t[1]))
        woman = cands[0][1]
        cur = fiance.get(woman)
        if cur is None or woman_scores[(woman, man)] > woman_scores[(woman, cur)]:
            fiance[woman] = man
    uf = UnionFind()
    for woman, man in fiance.items():
        uf.union(man, woman)
    comp = uf.components()
    out_nodes = sorted(comp)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(out_nodes, pa.int64()),
                "cluster_id": pa.array([comp[n] for n in out_nodes], pa.int64()),
            }
        )
    )


def center_clustering(
    pairs: ray.data.Dataset, threshold: float = 0.1
) -> ray.data.Dataset:
    """Center clustering (clustering.py:568-639): scan desc-weight edges;
    first-seen endpoint of an edge becomes a center — the one with the higher
    DEGREE-NORMALIZED weight sum (edges_weight[v]/edges_attached[v], reference
    :590-604,621-622; ties -> v2) — the other becomes its member. Edges are
    admitted with strict ``weight > threshold`` (reference :598)."""
    # degree-normalized weight sums over admitted edges
    wsum: dict[int, float] = {}
    deg: dict[int, int] = {}
    edges = _sorted_edges(pairs)
    for w, a, b in edges:
        if w <= threshold:
            continue
        wsum[a] = wsum.get(a, 0.0) + w
        wsum[b] = wsum.get(b, 0.0) + w
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    is_center: set[int] = set()
    is_member: dict[int, int] = {}
    for w, a, b in edges:
        if w <= threshold:
            continue
        a_free = a not in is_center and a not in is_member
        b_free = b not in is_center and b not in is_member
        if a_free and b_free:
            na = wsum[a] / deg[a]
            nb = wsum[b] / deg[b]
            center, member = (a, b) if na > nb else (b, a)
            is_center.add(center)
            is_member[member] = center
        elif a in is_center and b_free:
            is_member[b] = a
        elif b in is_center and a_free:
            is_member[a] = b
    rows_n, rows_c = [], []
    for c in sorted(is_center):
        rows_n.append(c)
        rows_c.append(c)
    for m in sorted(is_member):
        rows_n.append(m)
        rows_c.append(is_member[m])
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(rows_n, pa.int64()), "cluster_id": pa.array(rows_c, pa.int64())})
    )
