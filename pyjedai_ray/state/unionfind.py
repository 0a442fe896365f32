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

    # initial labels: every node labels itself
    n1 = edges.select_columns(["id1"]).rename_columns({"id1": "node"})
    n2 = edges.select_columns(["id2"]).rename_columns({"id2": "node"})
    labels = stamp_schema(
        n1.union(n2).groupby("node").aggregate(Min("node", alias_name="cluster_id")),
        lab_schema,
    ).materialize()
    nparts = max(2, min(64, labels.num_blocks()))

    prev_sum = labels.sum("cluster_id")
    for _ in range(max_iters):
        lab1 = labels.rename_columns({"node": "id1", "cluster_id": "l1"})
        lab2 = labels.rename_columns({"node": "id2", "cluster_id": "l2"})
        e = hash_join(edges, lab1, on=("id1",), num_partitions=nparts)
        e = hash_join(e, lab2, on=("id2",), num_partitions=nparts)
        # send each endpoint the other's label (hash-to-min exchange)
        m1 = e.select_columns(["id1", "l2"]).rename_columns(
            {"id1": "node", "l2": "cluster_id"}
        )
        m2 = e.select_columns(["id2", "l1"]).rename_columns(
            {"id2": "node", "l1": "cluster_id"}
        )
        labels = stamp_schema(
            labels.union(m1)
            .union(m2)
            .groupby("node")
            .aggregate(Min("cluster_id", alias_name="cluster_id")),
            lab_schema,
        ).materialize()
        # pointer jumping (path doubling): pull label[label] so chains
        # converge in O(log n) rounds instead of O(diameter)
        parents = labels.rename_columns({"node": "cluster_id", "cluster_id": "grand"})
        jumped = hash_join(labels, parents, on=("cluster_id",), num_partitions=nparts)
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
