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


def _sorted_edges(
    pairs: ray.data.Dataset,
    threshold: float | None = None,
    max_edges: int = DRIVER_EDGE_LIMIT,
) -> list[tuple[float, int, int]]:
    """Collect edges sorted by (weight desc, id1, id2) — deterministic greedy
    input order. Driver-side by design (see module docstring), so it is
    guarded: edges are pre-filtered distributedly to ``weight > threshold``
    (every serial clusterer admits strictly-above-threshold edges only), and
    a post-filter edge count above ``max_edges`` raises instead of OOMing
    the driver — mirroring DRIVER_EDGE_LIMIT in connected_components."""
    cols = pairs.columns()  # None when Ray's schema derivation gives up
    if threshold is not None and (cols is None or "weight" in cols):
        pairs = pairs.filter(expr=f"weight > {threshold!r}")
    n = pairs.count()
    if n > max_edges:
        raise ValueError(
            f"{n} verified edges exceed the driver-side clusterer cap "
            f"({max_edges}); raise max_edges or pre-prune the pair graph "
            f"(these serial-greedy methods are order-dependent by definition "
            f"and cannot be distributed without changing their semantics)"
        )
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
    for w, a, b in _sorted_edges(pairs, threshold=threshold):
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
    for w, a, b in _sorted_edges(pairs, threshold=threshold):
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
    for w, a, b in _sorted_edges(pairs, threshold=threshold):
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


def correlation_clustering(
    pairs: ray.data.Dataset,
    initial_threshold: float = 0.5,
    similarity_threshold: float = 0.8,
    non_similarity_threshold: float = 0.2,
    move_limit: int = 3,
    lsi_iterations: int = 100,
    seed: int = 42,
) -> ray.data.Dataset:
    """Correlation clustering (reference clustering.py:793-1005): connected
    components of edges >= initial_threshold seed the clusters, then a seeded
    local search applies random moves (reassign entity / merge clusters /
    split cluster), keeping a move iff the objective strictly improves. The
    objective counts similar pairs (> similarity_threshold) placed together
    plus dissimilar pairs (< non_similarity_threshold) placed apart.

    Documented divergences (the algorithm is the spec, SURVEY.md §7): the
    entity universe is the nodes OBSERVED in the pair graph — the reference
    ranges over the full id space, where never-seen entities silently share
    cluster slot 0 (an indexing artifact); the objective is one vectorized
    numpy pass over all observed-node pairs instead of a dense double loop;
    the rng is seeded but its draw sequence is not call-for-call identical
    to the reference's (whose tie order is dict/set-iteration dependent).
    Driver-side over the post-verification graph, like the other serial
    methods (module docstring)."""
    import random as _random

    edges = _sorted_edges(pairs)
    nodes = sorted({n for _, a, b in edges for n in (a, b)})
    if not nodes:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})
        )
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    sim = np.zeros((n, n), dtype=np.float64)
    uf = UnionFind()
    for node in nodes:
        uf.find(node)
    for w, a, b in edges:
        sim[idx[a], idx[b]] = sim[idx[b], idx[a]] = w
        if w >= initial_threshold:
            uf.union(a, b)

    iu, ju = np.triu_indices(n, k=1)
    s = sim[iu, ju]
    similar = s > similarity_threshold
    not_similar = s < non_similarity_threshold

    comp = uf.components()
    comp_labels = sorted({comp[nd] for nd in nodes})
    label_of_comp = {c: i for i, c in enumerate(comp_labels)}
    labels = np.array([label_of_comp[comp[nd]] for nd in nodes], dtype=np.int64)
    members: list[set[int]] = [set() for _ in comp_labels]
    for i, lb in enumerate(labels):
        members[lb].add(i)
    next_label = len(members)

    def objective(lab: np.ndarray) -> int:
        same = lab[iu] == lab[ju]
        return int(np.count_nonzero(similar & same) + np.count_nonzero(not_similar & ~same))

    rng = _random.Random(seed)
    nonempty = lambda: [i for i, m in enumerate(members) if m]
    of = objective(labels)
    for _ in range(lsi_iterations):
        move = rng.randint(0, move_limit - 1)
        live = nonempty()
        while move == 1 and len(live) < 2:
            move = rng.randint(0, move_limit - 1)
        if move == 0:  # reassign a random entity to a random live cluster
            ent = rng.randrange(n)
            dst = live[rng.randrange(len(live))]
            src = int(labels[ent])
            if dst == src:
                continue
            labels[ent] = dst
            new_of = objective(labels)
            if new_of > of:
                members[src].discard(ent)
                members[dst].add(ent)
                of = new_of
            else:
                labels[ent] = src
        elif move == 1:  # merge two random clusters
            a_i = live[rng.randrange(len(live))]
            b_i = live[rng.randrange(len(live))]
            while b_i == a_i:
                b_i = live[rng.randrange(len(live))]
            moved = list(members[a_i])
            labels[moved] = b_i
            new_of = objective(labels)
            if new_of > of:
                members[b_i] |= members[a_i]
                members[a_i] = set()
                of = new_of
            else:
                labels[moved] = a_i
        else:  # split: every 2nd member (sorted order) to a new cluster
            src = live[rng.randrange(len(live))]
            half = sorted(members[src])[::2]
            if not half:
                continue
            labels[half] = next_label
            new_of = objective(labels)
            if new_of > of:
                members.append(set(half))
                members[src] -= set(half)
                next_label += 1
                of = new_of
            else:
                labels[half] = src

    # cluster_id = min doc_id of the cluster (engine-wide convention)
    min_id: dict[int, int] = {}
    for i, lb in enumerate(labels):
        nid = nodes[i]
        if lb not in min_id or nid < min_id[lb]:
            min_id[lb] = nid
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(nodes, pa.int64()),
                "cluster_id": pa.array([min_id[int(lb)] for lb in labels], pa.int64()),
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
    admitted = _sorted_edges(pairs, threshold=threshold)
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


def _min_cut(cap: np.ndarray, s: int, t: int) -> tuple[float, np.ndarray]:
    """Edmonds-Karp max-flow / min-cut on a dense residual matrix.
    Returns (flow value, boolean mask of the MINIMAL s-side of the min cut —
    residual reachability from s). `cap` is mutated into the residual.
    The BFS expands the whole frontier per step with one vectorized slice
    (frontier-rows x all-columns), so each augmenting-path search costs
    O(diameter) numpy ops, not O(V + E) Python iterations."""
    n = cap.shape[0]
    flow = 0.0
    while True:
        parent = np.full(n, -1, dtype=np.int64)
        parent[s] = s
        frontier = np.array([s], dtype=np.int64)
        while len(frontier) and parent[t] == -1:
            sub = cap[frontier] > 1e-12  # |F| x n
            newly = sub.any(axis=0) & (parent == -1)
            idx = np.flatnonzero(newly)
            if len(idx) == 0:
                break
            # for each newly-reached v pick the first frontier row that reaches it
            parent[idx] = frontier[np.argmax(sub[:, idx], axis=0)]
            frontier = idx
        if parent[t] == -1:
            return flow, parent != -1
        bottleneck = np.inf
        v = t
        while v != s:
            u = parent[v]
            bottleneck = min(bottleneck, cap[u, v])
            v = u
        v = t
        while v != s:
            u = parent[v]
            cap[u, v] -= bottleneck
            cap[v, u] += bottleneck
            v = u
        flow += bottleneck


def cut_clustering(
    pairs: ray.data.Dataset, threshold: float = 0.5, alpha: float = 0.2
) -> ray.data.Dataset:
    """Flake-Tarjan Cut Clustering (reference clustering.py:1007-1053):
    trim the similarity graph to edges with weight STRICTLY over `threshold`,
    attach an artificial sink to every node with capacity `alpha`, take the
    Gomory-Hu tree of the augmented graph, remove the sink, and return the
    connected components of the remaining forest.

    Algorithm: the Flake-Tarjan min-cut-tree theorem ("Graph Clustering and
    Minimum Cut Trees", Internet Mathematics 1(4), 2004) says the partition
    obtained by deleting the sink from the min-cut (Gomory-Hu) tree equals
    the communities produced by per-source sink cuts: for an unassigned
    node s, the MINIMAL source side of the (s, sink) min cut (residual
    reachability) is s's community. We run that directly — ONE max flow per
    emitted cluster instead of Gusfield's one per node, which is the
    difference between minutes and hours on a dense verified graph.
    Nodes are visited in ascending id (deterministic); the reference's
    networkx tree realizes tie cuts insertion-dependently, we pin the
    minimal source side (documented divergence, same class as CNP ties).

    Decomposition that makes this scale: nodes in different trimmed
    components touch each other only through the sink, so min cuts — and
    hence the tree minus the sink — factor exactly over trimmed components;
    each component gets its own dense matrix + sink. A node with no
    over-threshold edge is a singleton and comes back implicitly via
    attach_clusters. Driver-side over the small verified edge list like the
    other serial-by-definition clusterers (module docstring)."""
    admitted = _sorted_edges(pairs, threshold=threshold)
    uf = UnionFind()
    for _, a, b in admitted:
        uf.union(a, b)
    comp = uf.components()
    by_comp: dict[int, list[tuple[float, int, int]]] = {}
    for w, a, b in admitted:
        by_comp.setdefault(comp[a], []).append((w, a, b))

    out_nodes: list[int] = []
    out_labels: list[int] = []
    for root in sorted(by_comp):
        cedges = by_comp[root]
        nodes = sorted({n for _, a, b in cedges for n in (a, b)})
        idx = {n: i + 1 for i, n in enumerate(nodes)}  # 0 = sink
        k = len(nodes)
        cap0 = np.zeros((k + 1, k + 1), dtype=np.float64)
        cap0[0, 1:] = alpha
        cap0[1:, 0] = alpha
        for w, a, b in cedges:
            cap0[idx[a], idx[b]] += w
            cap0[idx[b], idx[a]] += w
        assigned = np.zeros(k + 1, dtype=bool)
        assigned[0] = True  # sink
        for i in range(1, k + 1):
            if assigned[i]:
                continue
            _, s_side = _min_cut(cap0.copy(), i, 0)
            members = np.flatnonzero(s_side & ~assigned)
            assigned[members] = True
            label = min(nodes[int(j) - 1] for j in members)
            for j in members:
                out_nodes.append(nodes[int(j) - 1])
                out_labels.append(label)

    order = np.argsort(np.array(out_nodes, dtype=np.int64)) if out_nodes else []
    nodes_arr = np.array(out_nodes, dtype=np.int64)
    labels_arr = np.array(out_labels, dtype=np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(nodes_arr[order] if len(nodes_arr) else nodes_arr, pa.int64()),
                "cluster_id": pa.array(labels_arr[order] if len(labels_arr) else labels_arr, pa.int64()),
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
    for w, a, b in _sorted_edges(pairs, threshold=threshold):
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


def ricochet_sr_clustering(
    pairs: ray.data.Dataset, threshold: float = 0.5
) -> ray.data.Dataset:
    """Ricochet Sequential Rippling clustering (reference clustering.py:
    1343-1490, CCER-only). Vertices are visited in descending average edge
    weight; the first becomes a center with one seed member, and each later
    vertex becomes a new center when its best not-yet-better-served neighbor
    would prefer it (strictly higher similarity than its current
    center-similarity, default 0), stealing that neighbor and itself from
    their clusters; centers left alone are re-homed to the best available
    near-empty center (reference :1449-1470, replicated quirks included).

    Pinned total orders (the reference's depend on dict/heap insertion,
    SURVEY.md §7): vertex order (avg weight desc, id asc); within-vertex
    neighbor order (similarity desc, id asc). Output covers observed nodes
    only; cluster_id = min member id. Driver-side over the small
    post-verification graph (module docstring); admission strict
    ``weight > threshold`` (reference :1376)."""
    adj: dict[int, dict[int, float]] = {}
    for w, a, b in _sorted_edges(pairs, threshold=threshold):
        adj.setdefault(a, {})[b] = w
        adj.setdefault(b, {})[a] = w
    if not adj:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})
        )
    order = sorted(
        adj, key=lambda v: (-(sum(adj[v].values()) / len(adj[v])), v)
    )

    def neighbors_of(v: int) -> list[tuple[int, float]]:
        return sorted(adj[v].items(), key=lambda kv: (-kv[1], kv[0]))

    centers: set[int] = set()
    members: set[int] = set()
    center_of: dict[int, int] = {}
    sim_with_center: dict[int, float] = {}
    clusters: dict[int, set[int]] = {}

    first = order[0]
    centers.add(first)
    center_of[first] = first
    clusters[first] = {first}
    sim_with_center[first] = 1.0
    seed_nb = neighbors_of(first)[0][0]
    members.add(seed_nb)
    center_of[seed_nb] = first
    clusters[first].add(seed_nb)
    sim_with_center[seed_nb] = adj[first][seed_nb]

    for v in order[1:]:
        to_reassign: set[int] = set()
        centers_to_reassign: set[int] = set()
        for nb, sim in neighbors_of(v):
            if nb in centers:
                continue
            if sim_with_center.get(nb, 0.0) >= sim:
                continue
            to_reassign.add(nb)
            break
        if to_reassign:
            if v in members:
                members.remove(v)
                prev = center_of[v]
                clusters[prev].discard(v)
                if len(clusters[prev]) < 2:
                    centers_to_reassign.add(prev)
            to_reassign.add(v)
            clusters.setdefault(v, set()).update(to_reassign)
            centers.add(v)
        for r in to_reassign:
            if r == v:
                continue
            if r in members:
                prev = center_of[r]
                clusters[prev].discard(r)
                if len(clusters[prev]) < 2:
                    centers_to_reassign.add(prev)
            members.add(r)
            center_of[r] = v
            sim_with_center[r] = adj[v][r]
        for c in sorted(centers_to_reassign):
            if len(clusters.get(c, ())) > 1:
                continue
            centers.discard(c)
            clusters.pop(c, None)
            max_sim, new_center = 0.0, v
            for center in sorted(centers):
                new_sim = adj[center].get(c, 0.0)
                if new_sim > 0.0:
                    if len(clusters.get(center, ())) > 1:
                        continue
                    if new_sim > max_sim:
                        max_sim, new_center = new_sim, center
            if len(clusters.get(new_center, ())) > 1:
                continue
            clusters.setdefault(new_center, set()).add(c)
            members.add(c)
            center_of[c] = new_center
            sim_with_center[c] = max_sim

    rows_n, rows_c = [], []
    for _center, mset in clusters.items():
        cid = min(mset)
        for m in sorted(mset):
            rows_n.append(m)
            rows_c.append(cid)
    order_idx = np.argsort(np.array(rows_n))
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.array(rows_n, dtype=np.int64)[order_idx]),
                "cluster_id": pa.array(np.array(rows_c, dtype=np.int64)[order_idx]),
            }
        )
    )


def row_column_clustering(
    pairs: ray.data.Dataset, threshold: float = 0.5
) -> ray.data.Dataset:
    """Row-Column clustering (reference clustering.py:1493-1633, CCER-only):
    greedy min-cost assignment in the (1 - similarity) matrix — scan rows
    picking each row's cheapest uncovered column, scan columns picking each
    column's cheapest uncovered row, keep whichever full scan was cheaper —
    then emit the assignment's pairs above the similarity threshold with a
    first-come dedup.

    Documented divergences: the matrix spans OBSERVED nodes (the reference
    allocates the full n1 x n2 id space; absent pairs cost 1.0 either way);
    the final filter keeps pairs with intended ``similarity > threshold`` —
    the reference reads ``self.similarity`` AFTER overwriting it with the
    negated matrix (:1539 via :1624), silently inverting its own test."""
    sim: dict[tuple[int, int], float] = {}
    rows_set: set[int] = set()
    cols_set: set[int] = set()
    for w, a, b in _sorted_edges(pairs):
        if w > threshold:
            sim[(a, b)] = w
        rows_set.add(a)
        cols_set.add(b)
    rows = sorted(rows_set)
    cols = sorted(cols_set)
    if not rows or not cols:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})
        )
    neg = np.ones((len(rows), len(cols)), dtype=np.float64)
    ridx = {r: i for i, r in enumerate(rows)}
    cidx = {c: j for j, c in enumerate(cols)}
    for (a, b), w in sim.items():
        neg[ridx[a], cidx[b]] = 1.0 - w

    def _scan(mat: np.ndarray) -> tuple[list[int], float]:
        """Greedy per-row cheapest uncovered column (ties -> lowest index)."""
        covered = np.zeros(mat.shape[1], dtype=bool)
        sel = [-1] * mat.shape[0]
        cost = 0.0
        for i in range(mat.shape[0]):
            open_cols = np.flatnonzero(~covered)
            if open_cols.size == 0:
                break
            j = open_cols[int(np.argmin(mat[i, open_cols]))]
            sel[i] = int(j)
            covered[j] = True
            cost += mat[i, j]
        return sel, cost

    row_sel, row_cost = _scan(neg)
    col_sel, col_cost = _scan(neg.T)  # per-column cheapest uncovered row
    if row_cost < col_cost:
        assignment = {i: j for i, j in enumerate(row_sel) if j >= 0}
    else:
        assignment = {i: j for j, i in enumerate(col_sel) if i >= 0}

    matched: set[int] = set()
    out1, out2 = [], []
    for i in sorted(assignment):
        a, b = rows[i], cols[assignment[i]]
        w = sim.get((a, b))
        if w is None:  # at/below threshold
            continue
        if a in matched or b in matched:
            continue
        matched.add(a)
        matched.add(b)
        out1.append(a)
        out2.append(b)
    rows_n, rows_c = [], []
    for a, b in zip(out1, out2):
        cid = min(a, b)
        rows_n.extend([a, b])
        rows_c.extend([cid, cid])
    order = np.argsort(np.array(rows_n)) if rows_n else np.array([], dtype=np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.array(rows_n, dtype=np.int64)[order]),
                "cluster_id": pa.array(np.array(rows_c, dtype=np.int64)[order]),
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
    edges = _sorted_edges(pairs, threshold=threshold)
    for w, a, b in edges:
        wsum[a] = wsum.get(a, 0.0) + w
        wsum[b] = wsum.get(b, 0.0) + w
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    is_center: set[int] = set()
    is_member: dict[int, int] = {}
    for w, a, b in edges:
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
