"""Declarative workflow runner — the reference's workflow-as-config surface.

Reference: ``BlockingBasedWorkFlow.run`` (src/pyjedai/workflow.py:528-690)
consumes stage dicts ``{method, params, exec_params}`` and chains
block building -> block cleaning -> comparison cleaning -> matching ->
clustering. Here the same chain compiles to Ray Data transforms over the
canonical docs/edges/pairs/clusters Datasets.

Config shape (all stages optional except blocking):

    {
      "blocking":    {"keyer": "standard" | "qgrams" | "suffix" |
                       "extended_suffix" | "extended_qgrams" | "shingle" |
                       "minhash" | "simhash", ...keyer params},
      "cleaning":    [{"method": "purging", "smoothing_factor": 1.025},
                      {"method": "filtering", "ratio": 0.8}],
      "comparison":  {"scheme": "CBS" | "ARCS" | "JS" | ... ,
                      "pruning": "wep" | "cep" | "cnp" | "rcnp" | "wnp" |
                                 "rwnp" | "blast" | "none"},
      "matching":    {"metric": "jaccard" | "cosine" | ... ,
                      "tokenizer": "word" | "qgram",
                      "threshold": 0.5}            # omit -> use graph weights
      "clustering":  {"method": "connected_components" | "unique_mapping" |
                      "center" | "best_match" | "merge_center" | "markov" |
                      "kiraly" | "correlation" | "ricochet" | "row_column" |
                      "cut",
                      "threshold": 0.1},           # "cut" also takes "alpha"
    }

Mirrors the predefined recipes at workflow.py:696-800 in spirit: see
``best_dedup_workflow`` below.
"""

from __future__ import annotations

import ray.data

from ..config import DedupConfig
from ..stages import block_cleaning, blocking, clustering, matching, meta_blocking, minhash


def run_workflow(
    docs: ray.data.Dataset,
    config: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
    dataset_limit: int | None = None,
) -> dict:
    """Execute a declarative ER workflow; returns all intermediate Datasets."""
    out: dict = {}
    d = docs.select_columns([id_col, text_col]).rename_columns(
        {id_col: "doc_id", text_col: "text"}
    )

    # ---- blocking -> edge list -------------------------------------------
    bcfg = dict(config.get("blocking", {"keyer": "standard"}))
    keyer = bcfg.pop("keyer", "standard")
    dedup_cfg = DedupConfig(**bcfg.pop("dedup_config", {})) if "dedup_config" in bcfg else DedupConfig()
    if keyer == "minhash":
        sigs = minhash.sign(d, dedup_cfg)
        out["sigs"] = sigs = sigs.materialize()
        edges = minhash.explode_bands(sigs)
    elif keyer == "simhash":
        sigs = minhash.sign(d, dedup_cfg)
        out["sigs"] = sigs = sigs.materialize()
        edges = minhash.explode_simhash_bands(sigs, bands=bcfg.pop("bands", 4))
    else:
        edges = blocking.explode_keys(d, keyer=keyer, **bcfg)
    edges = edges.materialize()

    # drop singleton blocks (build_blocks' _clean_blocks semantics)
    edges = blocking.blocks_with_sizes(
        edges, min_size=2, num_partitions=num_partitions
    ).select_columns(["key", "doc_id"]).materialize()
    out["edges"] = edges

    # ---- block cleaning ---------------------------------------------------
    for step in config.get("cleaning", []):
        method = step.get("method")
        if method == "purging":
            edges, thr = block_cleaning.block_purging(
                edges, step.get("smoothing_factor", 1.025), num_partitions
            )
            out["purging_threshold"] = thr
        elif method == "filtering":
            edges = block_cleaning.block_filtering(
                edges, step.get("ratio", 0.8), num_partitions
            )
        else:
            raise ValueError(f"unknown cleaning method {method}")
        edges = edges.materialize()
    out["edges_cleaned"] = edges

    # ---- candidates + comparison cleaning --------------------------------
    ccfg = config.get("comparison", {"scheme": "CBS", "pruning": "none"})
    cands = blocking.candidate_pairs(
        edges,
        max_block_size=ccfg.get("max_block_size", 1 << 30),
        num_partitions=num_partitions,
        chain_oversize=ccfg.get("chain_oversize", False),
        dataset_limit=dataset_limit,
    ).materialize()
    out["candidates"] = cands

    weighted = meta_blocking.weighted_pairs(
        cands, edges, scheme=ccfg.get("scheme", "CBS"), num_partitions=num_partitions
    ).materialize()
    pruning = ccfg.get("pruning", "none")
    if pruning == "wep":
        pairs = meta_blocking.wep(weighted)
    elif pruning == "cep":
        pairs = meta_blocking.cep(weighted, edges)
    elif pruning == "cnp":
        pairs = meta_blocking.cnp(weighted, edges, num_entities=d.count())
    elif pruning == "rcnp":
        pairs = meta_blocking.rcnp(weighted, edges, num_entities=d.count())
    elif pruning == "wnp":
        pairs = meta_blocking.wnp(weighted, num_partitions)
    elif pruning == "rwnp":
        pairs = meta_blocking.rwnp(weighted, num_partitions)
    elif pruning == "blast":
        pairs = meta_blocking.blast(weighted, num_partitions)
    elif pruning == "none":
        pairs = weighted
    else:
        raise ValueError(f"unknown pruning {pruning}")
    pairs = pairs.materialize()
    out["pruned"] = pairs

    # ---- matching (pairwise verification) --------------------------------
    mcfg = config.get("matching")
    if mcfg:
        pairs = matching.verify_pairs_text(
            pairs.select_columns(["id1", "id2"]),
            d,
            metric=mcfg.get("metric", "jaccard"),
            tokenizer=mcfg.get("tokenizer", "word"),
            threshold=mcfg.get("threshold", 0.5),
            num_partitions=num_partitions,
        ).materialize()
        out["verified"] = pairs

    # ---- clustering -------------------------------------------------------
    kcfg = config.get("clustering", {"method": "connected_components"})
    method = kcfg.get("method", "connected_components")
    thr = kcfg.get("threshold")
    if method == "connected_components":
        clusters = clustering.connected_components(pairs, threshold=thr)
    elif method == "unique_mapping":
        clusters = clustering.unique_mapping_clustering(pairs, thr or 0.1)
    elif method == "center":
        clusters = clustering.center_clustering(pairs, thr or 0.1)
    elif method == "merge_center":
        clusters = clustering.merge_center_clustering(pairs, thr or 0.1)
    elif method == "best_match":
        clusters = clustering.best_match_clustering(pairs, thr or 0.1)
    elif method == "markov":
        clusters = clustering.markov_clustering(pairs, thr or 0.5)
    elif method == "kiraly":
        clusters = clustering.kiraly_clustering(pairs, thr or 0.1)
    elif method == "correlation":
        clusters = clustering.correlation_clustering(pairs, initial_threshold=thr or 0.5)
    elif method == "ricochet":
        clusters = clustering.ricochet_sr_clustering(pairs, thr or 0.5)
    elif method == "row_column":
        clusters = clustering.row_column_clustering(pairs, thr or 0.5)
    elif method == "cut":
        clusters = clustering.cut_clustering(
            pairs, thr or 0.5, alpha=kcfg.get("alpha", 0.2)
        )
    else:
        raise ValueError(f"unknown clustering method {method}")
    out["clusters"] = clusters
    return out


# the reference's best_blocking_workflow_der analog (workflow.py:781-800):
# StandardBlocking + BlockFiltering + WEP + profile Jaccard + CC clustering
best_dedup_workflow = {
    "blocking": {"keyer": "standard"},
    "cleaning": [{"method": "purging"}, {"method": "filtering", "ratio": 0.8}],
    "comparison": {"scheme": "CBS", "pruning": "wep"},
    "matching": {"metric": "jaccard", "tokenizer": "word", "threshold": 0.5},
    "clustering": {"method": "connected_components"},
}


def link_datasets(
    d1: ray.data.Dataset,
    d2: ray.data.Dataset,
    config: dict | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
) -> dict:
    """Clean-Clean ER (two-table record linkage).

    Reference semantics (datamodel.py:114-117): D1 ids keep their value in
    [0, n1); D2 ids are offset by ``dataset_limit`` = n1; blocks only count
    when they hold both sides and only cross-dataset pairs are compared
    (utils.py:110-122). Greedy 1-1 matching via UniqueMappingClustering is
    the default clustering (clustering.py:477-539)."""
    import pyarrow as pa

    n1 = d1.count()

    a = d1.select_columns([id_col, text_col]).rename_columns(
        {id_col: "doc_id", text_col: "text"}
    )

    def _offset(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch["doc_id"].to_numpy(zero_copy_only=False) + n1
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": batch["text"]})

    b = (
        d2.select_columns([id_col, text_col])
        .rename_columns({id_col: "doc_id", text_col: "text"})
        .map_batches(_offset, batch_format="pyarrow")
    )
    both = a.union(b)
    cfg = config or {
        "blocking": {"keyer": "standard"},
        "comparison": {"scheme": "CBS", "pruning": "none"},
        "matching": {"metric": "jaccard", "tokenizer": "word", "threshold": 0.4},
        "clustering": {"method": "unique_mapping", "threshold": 0.4},
    }
    out = run_workflow(
        both, cfg, num_partitions=num_partitions, dataset_limit=n1
    )
    out["dataset_limit"] = n1
    return out
