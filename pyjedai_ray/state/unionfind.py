"""Union-find / connected components.

Reference analog: ``ConnectedComponentsClustering`` (src/pyjedai/
clustering.py:431-475) builds a networkx graph and takes connected components
in driver memory. Here:

* ``UnionFind``            — array-based DSU with path halving; used driver-side
  when the (post-verification) edge list is small, and inside per-partition
  combiners.
* ``label_propagation``    — distributed min-label propagation over a Ray
  Dataset of edges: iterative ``join`` + ``groupby(node).min(label)`` rounds
  until the global label sum reaches a fixpoint (monotone decreasing, so the
  sum is a safe convergence witness). Converges in O(max component diameter)
  rounds; near-dup clusters are small-diameter so this is ~3-5 rounds.

Cluster ids are ``min(doc_id)`` of the component — deterministic, no
dependence on partition arrival order (SURVEY.md §7 determinism rule).
"""

from __future__ import annotations


class UnionFind:
    """Array-free DSU over arbitrary int keys (dict-backed, path halving)."""

    def __init__(self) -> None:
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        parent = self.parent
        root = parent.setdefault(x, x)
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # union by min id -> representative is the smallest member, which
        # makes cluster_id = find(x) deterministic without a second pass
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra

    def components(self) -> dict[int, int]:
        """node -> min-id representative for every node ever seen."""
        return {x: self.find(x) for x in list(self.parent)}


def driver_connected_components(edge_iter) -> dict[int, int]:
    """Union-find over an iterator of (id1, id2) pairs; returns node->cluster."""
    uf = UnionFind()
    for a, b in edge_iter:
        uf.union(int(a), int(b))
    return uf.components()


def label_propagation(edges, max_iters: int = 50):
    """Distributed connected components over an edges Dataset (id1, id2).

    Returns a Dataset (doc_id, cluster_id) covering every node in `edges`.
    Each iteration is two hash joins + a groupby-min — all streaming Ray Data
    ops; intermediate label tables are materialized per round (they are
    node-sized, far smaller than the input corpus).
    """
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Min

    from ..stages.exchange import hash_join, stamp_schema

    lab_schema = pa.schema([("node", pa.int64()), ("cluster_id", pa.int64())])

    # symmetrize ONCE and materialize: every round joins the same static
    # (src, dst) table — without this each round re-executes the caller's
    # whole upstream lineage to produce the edge list again
    fwd = edges.select_columns(["id1", "id2"]).rename_columns(
        {"id1": "src", "id2": "dst"}
    )
    rev = edges.select_columns(["id1", "id2"]).rename_columns(
        {"id1": "dst", "id2": "src"}
    )
    sym = fwd.union(rev).materialize()
    sym_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    # initial labels: every node labels itself
    labels = stamp_schema(
        sym.select_columns(["src"]).rename_columns({"src": "node"})
        .groupby("node").aggregate(Min("node", alias_name="cluster_id")),
        lab_schema,
    ).materialize()
    nparts = max(2, min(64, labels.num_blocks()))

    prev_sum = labels.sum("cluster_id")
    for _ in range(max_iters):
        # ONE join sends each src its neighbors' labels (hash-to-min exchange)
        e = hash_join(
            sym, labels.rename_columns({"node": "dst", "cluster_id": "lab"}),
            on=("dst",), num_partitions=nparts,
            left_schema=sym_schema,
            right_schema=pa.schema([("dst", pa.int64()), ("lab", pa.int64())]),
        )
        m = e.select_columns(["src", "lab"]).rename_columns(
            {"src": "node", "lab": "cluster_id"}
        )
        labels = stamp_schema(
            labels.union(m)
            .groupby("node")
            .aggregate(Min("cluster_id", alias_name="cluster_id")),
            lab_schema,
        ).materialize()
        # pointer jumping (path doubling): pull label[label] so chains
        # converge in O(log n) rounds instead of O(diameter)
        parents = labels.rename_columns({"node": "cluster_id", "cluster_id": "grand"})
        jumped = hash_join(
            labels, parents, on=("cluster_id",), num_partitions=nparts,
            left_schema=lab_schema,
            right_schema=pa.schema([("cluster_id", pa.int64()), ("grand", pa.int64())]),
        )
        j1 = jumped.select_columns(["node", "grand"]).rename_columns({"grand": "cluster_id"})
        labels = stamp_schema(
            labels.union(j1).groupby("node").aggregate(Min("cluster_id", alias_name="cluster_id")),
            lab_schema,
        ).materialize()
        cur_sum = labels.sum("cluster_id")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.rename_columns({"node": "doc_id"})
