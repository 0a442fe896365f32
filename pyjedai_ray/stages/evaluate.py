"""Evaluation: predicted pairs/clusters vs ground truth, as distributed joins.

Reference: ``Evaluation.calculate_scores`` (src/pyjedai/evaluation.py:54-79)
counts true positives by iterating rows; here TP is a hash semi-join between
the canonical predicted-pair Dataset and the GT-pair Dataset (SURVEY.md §1.3
"a pairs Dataset joined against predicted pairs ... instead of row-iterating
loops"). The progressive recall curve (evaluation.py:298-339) consumes the
(small, budget-limited) emitted list driver-side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .exchange import hash_join


def _canonical(pairs: ray.data.Dataset) -> ray.data.Dataset:
    def _c(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "id1" not in batch.column_names:
            return pa.schema([("id1", pa.int64()), ("id2", pa.int64())]).empty_table()
        a = batch["id1"].to_numpy(zero_copy_only=False)
        b = batch["id2"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id1": pa.array(np.minimum(a, b), pa.int64()),
                "id2": pa.array(np.maximum(a, b), pa.int64()),
            }
        )

    return pairs.map_batches(_c, batch_format="pyarrow")


def evaluate_pairs(
    predicted: ray.data.Dataset,
    ground_truth: ray.data.Dataset,
    num_partitions: int = 32,
) -> dict:
    """Precision / recall / F1 of predicted (id1,id2) vs GT (id1,id2)."""
    pred = _canonical(predicted.select_columns(["id1", "id2"])).materialize()
    gt = _canonical(ground_truth.select_columns(["id1", "id2"])).materialize()
    n_pred = pred.count()
    n_gt = gt.count()
    ids_schema = pa.schema([("id1", pa.int64()), ("id2", pa.int64())])
    tp = hash_join(
        pred,
        gt,
        on=("id1", "id2"),
        num_partitions=num_partitions,
        join_type="left semi",
        left_schema=ids_schema,
        right_schema=ids_schema,
    ).count()
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_gt if n_gt else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "true_positives": tp,
        "predicted_pairs": n_pred,
        "ground_truth_pairs": n_gt,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def clusters_to_pairs(clusters: ray.data.Dataset, num_partitions: int = 32) -> ray.data.Dataset:
    """(doc_id, cluster_id) -> all intra-cluster pairs (id1 < id2). Clusters
    are grouped per cluster_id; enormous clusters are capped by the same
    quadratic-guard discipline as blocking (caller should purge first)."""
    from .blocking import candidate_pairs

    edges = clusters.select_columns(["cluster_id", "doc_id"]).rename_columns(
        {"cluster_id": "key"}
    )
    return candidate_pairs(
        edges, max_block_size=1 << 20, num_partitions=num_partitions, chain_oversize=False
    ).select_columns(["id1", "id2"])


def progressive_recall_curve(
    emitted_pairs: list[tuple[float, int, int]], gt_pairs: set[tuple[int, int]]
) -> list[tuple[int, float]]:
    """Recall after each emission (calculate_tps_indices analog,
    evaluation.py:298-339) — driver-side over the budget-limited list."""
    seen = 0
    out = []
    total = max(1, len(gt_pairs))
    for i, (_w, a, b) in enumerate(emitted_pairs, 1):
        if (min(a, b), max(a, b)) in gt_pairs:
            seen += 1
        out.append((i, seen / total))
    return out
