"""Reference-API compatibility facade: the pyJedAI class surface over the
Ray-Data-native stages, so a user of the reference can port a pipeline by
changing imports — same class names, same constructor defaults, same
``build_blocks / process / predict / fit`` call shapes (SURVEY.md §2.12).

Differences from the reference (by design, documented once here):
  * Intermediate results are ``ray.data.Dataset``s — blocks are the edge
    list (key, doc_id), candidate graphs are (id1, id2[, weight]) pair
    Datasets, clusters are (doc_id, cluster_id) — never driver-side dicts /
    networkx graphs (datamodel.py:479-526 / matching.py:123-126 analogs).
  * ``Data`` accepts pandas DataFrames like the reference
    (datamodel.py:77-186) and applies the same fillna("") + str-cast +
    attribute-concat profile semantics, producing the internal contiguous
    id space with ``dataset_limit`` splitting D1/D2. DataFrame input is by
    nature driver-resident; at scale construct Datasets with
    ``sources.readers`` and pass them through the stage functions directly.
  * ``export_to_df`` maps internal ids back to the original id column
    values, mirroring the per-stage exports (block_building.py:291-325,
    matching.py:297-333, clustering.py:381-417).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .stages import block_cleaning, blocking, clustering, joins, matching, meta_blocking
from .stages.encoding import embeddings_nn_blocking as _nn_blocking

_DEFAULT_PARTITIONS = 32

# The facade's export/Evaluation methods return pandas DataFrames by API
# contract (the reference returns driver-side frames), which pulls the full
# result to the driver. For the CCER-sized datasets the facade targets that
# is fine; pointing it at a web-scale Dataset would OOM the driver instead of
# erroring — so every driver collect is guarded (the stages/clustering.py
# _sorted_edges pattern).
DRIVER_EXPORT_LIMIT = 5_000_000


def _guarded_to_pandas(ds: ray.data.Dataset, what: str, limit: int = DRIVER_EXPORT_LIMIT) -> pd.DataFrame:
    n = ds.count()
    if n > limit:
        raise ValueError(
            f"{what}: {n} rows exceed the driver-side export cap ({limit}); "
            f"the compat facade's DataFrame exports are for reference-sized "
            f"data — at this scale keep the result as a ray.data.Dataset "
            f"(write_parquet / iter_batches) via the stage functions directly"
        )
    return ds.to_pandas()


class Data:
    """Reference ``Data`` (datamodel.py:77-186): 1-2 pandas DataFrames with
    an id column and attribute list per side. Builds the profile string
    (whitespace-joined stringified attributes, block_building.py:372-375)
    and the contiguous internal id space 0..n1-1 / n1..n1+n2-1 with
    ``dataset_limit = n1`` (datamodel.py:115)."""

    def __init__(
        self,
        dataset_1: pd.DataFrame,
        id_column_name_1: str,
        attributes_1: list[str] | None = None,
        dataset_2: pd.DataFrame | None = None,
        id_column_name_2: str | None = None,
        attributes_2: list[str] | None = None,
        ground_truth: pd.DataFrame | None = None,
    ):
        def _side(df: pd.DataFrame, id_col: str, attrs: list[str] | None):
            df = df.reset_index(drop=True).fillna("").astype(str)
            attrs = attrs or [c for c in df.columns if c != id_col]
            profile = df[attrs].agg(" ".join, axis=1)
            return df[id_col].tolist(), profile.tolist()

        ids1, texts1 = _side(dataset_1, id_column_name_1, attributes_1)
        self.dataset_limit = len(ids1)
        self.is_dirty_er = dataset_2 is None
        orig_ids = list(ids1)
        texts = list(texts1)
        if dataset_2 is not None:
            ids2, texts2 = _side(dataset_2, id_column_name_2 or id_column_name_1, attributes_2)
            orig_ids += ids2
            texts += texts2
        self.num_entities = len(orig_ids)
        self._orig_ids = orig_ids  # internal id -> original id value
        self.ground_truth = ground_truth
        self.docs = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(self.num_entities), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )

    def to_original_ids(self, internal: pd.Series) -> pd.Series:
        lut = self._orig_ids
        return internal.map(lambda i: lut[int(i)])


def _export_pairs(pairs: ray.data.Dataset, data: Data) -> pd.DataFrame:
    """Pairs Dataset -> DataFrame(['id1','id2']) in original-id space."""
    df = _guarded_to_pandas(pairs.select_columns(["id1", "id2"]), "_export_pairs")
    return pd.DataFrame(
        {"id1": data.to_original_ids(df["id1"]), "id2": data.to_original_ids(df["id2"])}
    )


# ---------------------------------------------------------------- blocking --


class _BlockBuilder:
    _keyer = "standard"
    _max_block_size: int | None = None
    _kwargs: dict = {}

    def build_blocks(self, data: Data, attributes_1=None, attributes_2=None):
        """-> edge-list Dataset (key, doc_id), singleton blocks dropped
        (build_blocks + _clean_blocks, block_building.py:409-461); size-capped
        families apply their cap here (block_building.py:628-633)."""
        edges = blocking.explode_keys(data.docs, keyer=self._keyer, **self._kwargs)
        self.blocks = blocking.blocks_with_sizes(
            edges, min_size=2, max_size=self._max_block_size,
            num_partitions=_DEFAULT_PARTITIONS,
        ).select_columns(["key", "doc_id"]).materialize()
        return self.blocks

    def export_to_df(self, blocks: ray.data.Dataset, data: Data) -> pd.DataFrame:
        pairs = blocking.candidate_pairs(
            blocks, max_block_size=1 << 30, chain_oversize=False,
            dataset_limit=None if data.is_dirty_er else data.dataset_limit,
        ).select_columns(["id1", "id2"])
        return _export_pairs(pairs, data)


class StandardBlocking(_BlockBuilder):
    """block_building.py:485-525."""


class QGramsBlocking(_BlockBuilder):
    """block_building.py:527-576."""

    _keyer = "qgrams"

    def __init__(self, qgrams: int = 6):
        self._kwargs = {"q": qgrams}


class SuffixArraysBlocking(_BlockBuilder):
    """block_building.py:579-633 (cap 53)."""

    _keyer = "suffix"

    def __init__(self, suffix_length: int = 6, max_block_size: int = 53):
        self._kwargs = {"suffix_length": suffix_length}
        self._max_block_size = max_block_size


class ExtendedSuffixArraysBlocking(_BlockBuilder):
    """block_building.py:635-690 (cap 39)."""

    _keyer = "extended_suffix"

    def __init__(self, suffix_length: int = 6, max_block_size: int = 39):
        self._kwargs = {"suffix_length": suffix_length}
        self._max_block_size = max_block_size


class ExtendedQGramsBlocking(_BlockBuilder):
    """block_building.py:692-788."""

    _keyer = "extended_qgrams"

    def __init__(self, qgrams: int = 6, threshold: float = 0.95):
        self._kwargs = {"q": qgrams, "threshold": threshold}


class EmbeddingsNNBlockBuilding:
    """vector_based_blocking.py:61-590: encode -> quantize -> NN candidate
    pairs. The encoder kernel is the deterministic stub in this environment
    (stages/encoding.py docstring); real models plug into encode_texts."""

    def __init__(self, vectorizer: str = "stub-encoder", similarity_search: str = "ivf",
                 dim: int = 64, n_clusters: int = 8, top_k: int = 5):
        self.vectorizer = vectorizer
        self.similarity_search = similarity_search
        self.dim, self.n_clusters, self.top_k = dim, n_clusters, top_k

    def build_blocks(self, data: Data, **_):
        return _nn_blocking(
            data.docs, k=self.top_k, dim=self.dim, n_clusters=self.n_clusters
        )


# ---------------------------------------------------------- block cleaning --


class BlockPurging:
    """block_cleaning.py:110-207."""

    def __init__(self, smoothing_factor: float = 1.025):
        self.smoothing_factor = smoothing_factor

    def process(self, blocks: ray.data.Dataset, data: Data | None = None):
        out, self.threshold = block_cleaning.block_purging(
            blocks, self.smoothing_factor, _DEFAULT_PARTITIONS
        )
        return out.materialize()


class BlockFiltering:
    """block_cleaning.py:33-108."""

    def __init__(self, ratio: float = 0.8):
        self.ratio = ratio

    def process(self, blocks: ray.data.Dataset, data: Data | None = None):
        return block_cleaning.block_filtering(
            blocks, self.ratio, _DEFAULT_PARTITIONS
        ).materialize()


# ---------------------------------------------------- comparison cleaning --


def _weighted(blocks: ray.data.Dataset, scheme: str, data: Data | None):
    cands = blocking.candidate_pairs(
        blocks, max_block_size=1 << 30, chain_oversize=False,
        num_partitions=_DEFAULT_PARTITIONS,
        dataset_limit=None if (data is None or data.is_dirty_er) else data.dataset_limit,
    )
    return meta_blocking.weighted_pairs(
        cands, blocks, scheme=scheme, num_partitions=_DEFAULT_PARTITIONS
    ).materialize()


class ComparisonPropagation:
    """comparison_cleaning.py:310-342: all distinct comparisons."""

    def process(self, blocks: ray.data.Dataset, data: Data | None = None):
        return blocking.candidate_pairs(
            blocks, max_block_size=1 << 30, chain_oversize=False,
            num_partitions=_DEFAULT_PARTITIONS,
            dataset_limit=None if (data is None or data.is_dirty_er) else data.dataset_limit,
        ).select_columns(["id1", "id2"])


# reference scheme aliases -> our clean-form registry (meta_blocking.py
# module docstring: the CN-/SN- counter accumulation double-adds in the
# reference via an if/else fallthrough; we implement the clean
# 1/cardinality definitions once, so both prefixes map to the same scheme)
_SCHEME_MAP = {
    "CN-CBS": "CNC", "SN-CBS": "CNC",
    "SNC": "CNC", "SND": "CND", "SNJ": "CNJ",
}


class _MetaBlocking:
    def __init__(self, weighting_scheme: str):
        self.weighting_scheme = _SCHEME_MAP.get(weighting_scheme, weighting_scheme)

    def _prune(self, weighted, blocks, data):
        raise NotImplementedError

    def process(self, blocks: ray.data.Dataset, data: Data | None = None):
        w = _weighted(blocks, self.weighting_scheme, data)
        return self._prune(w, blocks, data).select_columns(["id1", "id2", "weight"])


class WeightedEdgePruning(_MetaBlocking):
    """comparison_cleaning.py:344-424."""

    def __init__(self, weighting_scheme: str = "CBS"):
        super().__init__(weighting_scheme)

    def _prune(self, w, blocks, data):
        return meta_blocking.wep(w)


class CardinalityEdgePruning(_MetaBlocking):
    """comparison_cleaning.py:426-473."""

    def __init__(self, weighting_scheme: str = "JS"):
        super().__init__(weighting_scheme)

    def _prune(self, w, blocks, data):
        return meta_blocking.cep(w, blocks)


class CardinalityNodePruning(_MetaBlocking):
    """comparison_cleaning.py:475-546."""

    def __init__(self, weighting_scheme: str = "CBS"):
        super().__init__(weighting_scheme)

    def _prune(self, w, blocks, data):
        n = data.num_entities if data is not None else None
        return meta_blocking.cnp(w, blocks, num_entities=n)


class ReciprocalCardinalityNodePruning(_MetaBlocking):
    """comparison_cleaning.py:548-568."""

    def __init__(self, weighting_scheme: str = "CN-CBS"):
        super().__init__(weighting_scheme)

    def _prune(self, w, blocks, data):
        n = data.num_entities if data is not None else None
        return meta_blocking.rcnp(w, blocks, num_entities=n)


class WeightedNodePruning(_MetaBlocking):
    """comparison_cleaning.py:570-618."""

    def __init__(self, weighting_scheme: str = "CBS"):
        super().__init__(weighting_scheme)

    def _prune(self, w, blocks, data):
        return meta_blocking.wnp(w, _DEFAULT_PARTITIONS)


class BLAST(_MetaBlocking):
    """comparison_cleaning.py:620-645."""

    def __init__(self, weighting_scheme: str = "X2"):
        super().__init__(weighting_scheme)

    def _prune(self, w, blocks, data):
        return meta_blocking.blast(w, _DEFAULT_PARTITIONS)


class ReciprocalWeightedNodePruning(_MetaBlocking):
    """comparison_cleaning.py:647-666."""

    def __init__(self, weighting_scheme: str = "CN-CBS"):
        super().__init__(weighting_scheme)

    def _prune(self, w, blocks, data):
        return meta_blocking.rwnp(w, _DEFAULT_PARTITIONS)


class ProgressiveCardinalityEdgePruning(_MetaBlocking):
    """comparison_cleaning.py:668-704."""

    def __init__(self, weighting_scheme: str = "JS", budget: int = 0):
        super().__init__(weighting_scheme)
        self.budget = budget

    def _prune(self, w, blocks, data):
        return meta_blocking.progressive_top(w, budget=self.budget)


class ProgressiveCardinalityNodePruning(_MetaBlocking):
    """comparison_cleaning.py:706-748."""

    def __init__(self, weighting_scheme: str = "CBS", budget: int = 0):
        super().__init__(weighting_scheme)
        self.budget = budget

    def _prune(self, w, blocks, data):
        n = data.num_entities if data is not None else None
        return meta_blocking.progressive_local_top(
            w, blocks, budget=self.budget, num_entities=n
        )


def get_meta_blocking_approach(acronym: str, w_scheme: str, budget: int = 0):
    """Acronym -> comparison-cleaning instance (comparison_cleaning.py:
    1088-1124). GPSN/LPSN map to the PSN-based progressive matchers (their
    `predict` takes the edge list directly)."""
    table = {
        "BLAST": lambda: BLAST(w_scheme),
        "CEP": lambda: CardinalityEdgePruning(w_scheme),
        "CNP": lambda: CardinalityNodePruning(w_scheme),
        "RCNP": lambda: ReciprocalCardinalityNodePruning(w_scheme),
        "RWNP": lambda: ReciprocalWeightedNodePruning(w_scheme),
        "WEP": lambda: WeightedEdgePruning(w_scheme),
        "WNP": lambda: WeightedNodePruning(w_scheme),
        "PCEP": lambda: ProgressiveCardinalityEdgePruning(w_scheme, budget),
        "PCNP": lambda: ProgressiveCardinalityNodePruning(w_scheme, budget),
        "GPSN": lambda: GlobalPSNM(budget=budget),
        "LPSN": lambda: LocalPSNM(budget=budget),
    }
    if acronym not in table:
        import warnings

        warnings.warn(
            "Wrong meta-blocking approach selected. Returning Comparison Propagation."
        )
        return ComparisonPropagation()
    return table[acronym]()


# ----------------------------------------------------------------- matching --

_TOKENIZER_MAP = {
    "white_space_tokenizer": "word",
    "char_qgram_tokenizer": "qgram",
    "word_qgram_tokenizer": "word",
}


class EntityMatching:
    """matching.py:342-462: per-candidate-pair string similarity."""

    def __init__(
        self,
        metric: str = "dice",
        tokenizer: str = "white_space_tokenizer",
        vectorizer: str | None = None,
        qgram: int = 1,
        similarity_threshold: float = 0.0,
    ):
        self.metric = metric
        self.tokenizer = _TOKENIZER_MAP.get(tokenizer, tokenizer)
        self.vectorizer = vectorizer
        self.similarity_threshold = similarity_threshold

    def predict(self, pairs: ray.data.Dataset, data: Data):
        if self.vectorizer in ("tfidf", "tf", "boolean"):
            return matching.verify_pairs_tfidf(
                pairs.select_columns(["id1", "id2"]), data.docs,
                threshold=self.similarity_threshold, vectorizer=self.vectorizer,
                num_partitions=_DEFAULT_PARTITIONS,
            )
        return matching.verify_pairs_text(
            pairs.select_columns(["id1", "id2"]), data.docs,
            metric=self.metric, tokenizer=self.tokenizer,
            threshold=self.similarity_threshold,
            num_partitions=_DEFAULT_PARTITIONS,
        )

    def export_to_df(self, pairs: ray.data.Dataset, data: Data) -> pd.DataFrame:
        return _export_pairs(pairs, data)


# -------------------------------------------------------------------- joins --


class _Join:
    def _run(self, docs):
        raise NotImplementedError

    def fit(self, data: Data):
        return self._run(data.docs)

    def export_to_df(self, pairs: ray.data.Dataset, data: Data) -> pd.DataFrame:
        return _export_pairs(pairs, data)


class EJoin(_Join):
    """joins.py:350-379."""

    def __init__(self, similarity_threshold: float = 0.82, metric: str = "cosine",
                 tokenization: str = "qgrams", qgrams: int = 2):
        self.similarity_threshold = similarity_threshold
        self.metric, self.tokenization, self.qgrams = metric, tokenization, qgrams

    def _run(self, docs):
        return joins.ejoin(
            docs, threshold=self.similarity_threshold, metric=self.metric,
            tokenization=self.tokenization, qgrams=self.qgrams,
            num_partitions=_DEFAULT_PARTITIONS,
        )


class TopKJoin(_Join):
    """joins.py:381-435."""

    def __init__(self, K: int, metric: str = "cosine",
                 tokenization: str = "qgrams", qgrams: int = 2):
        self.K, self.metric, self.tokenization, self.qgrams = K, metric, tokenization, qgrams

    def _run(self, docs):
        return joins.topk_join(
            docs, k=self.K, metric=self.metric, tokenization=self.tokenization,
            qgrams=self.qgrams, num_partitions=_DEFAULT_PARTITIONS,
        )


class PETopKJoin:
    """joins.py:437-551 (CCER: D1 probes against indexed D2)."""

    def __init__(self, K: int, metric: str = "cosine",
                 tokenization: str = "qgrams", qgrams: int = 2):
        self.K, self.metric, self.tokenization, self.qgrams = K, metric, tokenization, qgrams

    def fit(self, data: Data):
        if data.is_dirty_er:
            raise ValueError("PETopKJoin is Clean-Clean-only (joins.py:446)")
        lim = data.dataset_limit
        d1 = data.docs.filter(expr=f"doc_id < {lim}")
        d2 = data.docs.filter(expr=f"doc_id >= {lim}")
        return joins.pe_topk_join(
            d1, d2, k=self.K, metric=self.metric, tokenization=self.tokenization,
            qgrams=self.qgrams, dataset_limit=lim,
            num_partitions=_DEFAULT_PARTITIONS,
        )

    def export_to_df(self, pairs: ray.data.Dataset, data: Data) -> pd.DataFrame:
        return _export_pairs(pairs, data)


# ---------------------------------------------------------------- workflow --


class BlockingBasedWorkFlow:
    """Reference ``BlockingBasedWorkFlow`` (workflow.py:528-690): stage dicts
    ``{method: Class, params: {...}, exec_params: {...}}`` chained
    block building -> block cleaning -> comparison cleaning -> matching ->
    clustering; ``run(data)`` returns the cluster Dataset and stamps
    per-stage results + P/R/F1 (when Data has ground truth) on the instance.
    Preset recipes mirror workflow.py:696-800."""

    def __init__(
        self,
        block_building: dict | None = None,
        block_cleaning: list[dict] | None = None,
        comparison_cleaning: dict | None = None,
        entity_matching: dict | None = None,
        clustering: dict | None = None,
        name: str | None = None,
    ):
        self.block_building = block_building or dict(method=StandardBlocking)
        self.block_cleaning = block_cleaning or []
        self.comparison_cleaning = comparison_cleaning
        self.entity_matching = entity_matching
        self.clustering = clustering
        self.name = name or "workflow"
        self.results: dict = {}

    @staticmethod
    def _make(step: dict):
        return step["method"](**step.get("params", {}))

    def run(self, data: Data):
        blocks = self._make(self.block_building).build_blocks(data)
        for step in self.block_cleaning:
            blocks = self._make(step).process(blocks, data)
        self.results["blocks"] = blocks
        if self.comparison_cleaning is not None:
            pairs = self._make(self.comparison_cleaning).process(blocks, data)
        else:
            pairs = ComparisonPropagation().process(blocks, data)
        self.results["candidate_pairs"] = pairs
        if self.entity_matching is not None:
            pairs = self._make(self.entity_matching).predict(pairs, data)
        self.results["graph"] = pairs
        out = pairs
        if self.clustering is not None:
            step = self.clustering
            out = self._make(step).process(
                pairs, data, **step.get("exec_params", {})
            )
        self.results["clusters"] = out
        if data.ground_truth is not None:
            self.results["evaluation"] = Evaluation(data).report(out)
        return out


def best_blocking_workflow_ccer() -> BlockingBasedWorkFlow:
    """workflow.py:696-716 (EJS WEP + tfidf cosine matcher + UMC 0.17)."""
    return BlockingBasedWorkFlow(
        block_building=dict(method=StandardBlocking),
        block_cleaning=[dict(method=BlockFiltering, params=dict(ratio=0.9))],
        comparison_cleaning=dict(
            method=WeightedEdgePruning, params=dict(weighting_scheme="EJS")
        ),
        entity_matching=dict(
            method=EntityMatching,
            params=dict(metric="cosine", vectorizer="tfidf", similarity_threshold=0.0),
        ),
        clustering=dict(
            method=UniqueMappingClustering, exec_params=dict(similarity_threshold=0.17)
        ),
        name="best-ccer-workflow",
    )


def best_blocking_workflow_der() -> BlockingBasedWorkFlow:
    """workflow.py:718-738 (JS CNP + cosine matcher + connected components)."""
    return BlockingBasedWorkFlow(
        block_building=dict(method=StandardBlocking),
        block_cleaning=[
            dict(method=BlockPurging, params=dict(smoothing_factor=1.0)),
            dict(method=BlockFiltering),
        ],
        comparison_cleaning=dict(
            method=CardinalityNodePruning, params=dict(weighting_scheme="JS")
        ),
        entity_matching=dict(
            method=EntityMatching,
            params=dict(metric="cosine", similarity_threshold=0.55),
        ),
        clustering=dict(method=ConnectedComponentsClustering),
        name="best-der-workflow",
    )


# ------------------------------------------------------------ prioritization --


class _ProgressiveMatcher:
    """Shared shape for the reference's ProgressiveMatching family
    (prioritization.py:115-372): ``predict(blocks, data, budget)`` emits a
    budget-limited (id1, id2, weight) pair Dataset in priority order."""

    def __init__(self, weighting_scheme: str = "JS", budget: int = 0):
        self.weighting_scheme = _SCHEME_MAP.get(weighting_scheme, weighting_scheme)
        self.budget = budget

    def predict(self, blocks: ray.data.Dataset, data: Data | None = None,
                budget: int | None = None):
        b = self.budget if budget is None else budget
        w = _weighted(blocks, self.weighting_scheme, data)
        return self._emit(w, blocks, data, b)


class GlobalTopPM(_ProgressiveMatcher):
    """prioritization.py:506-561."""

    def _emit(self, w, blocks, data, budget):
        return meta_blocking.progressive_top(w, budget=budget)


class LocalTopPM(_ProgressiveMatcher):
    """prioritization.py:563-619."""

    def _emit(self, w, blocks, data, budget):
        n = data.num_entities if data is not None else None
        return meta_blocking.progressive_local_top(w, blocks, budget=budget, num_entities=n)


class RandomPM(_ProgressiveMatcher):
    """prioritization.py:952-985 (seeded random comparison sample)."""

    def __init__(self, fraction: float = 0.5, seed: int = 42):
        super().__init__("CBS", 0)
        self.fraction, self.seed = fraction, seed

    def _emit(self, w, blocks, data, budget):
        return meta_blocking.random_pairs(w, self.fraction, seed=self.seed)


class GlobalPSNM:
    """prioritization.py:872-911 (global progressive sorted neighborhood)."""

    def __init__(self, budget: int = 0, window: int = 2, max_window: int | None = None):
        self.budget, self.window, self.max_window = budget, window, max_window

    def predict(self, blocks: ray.data.Dataset, data: Data | None = None,
                budget: int | None = None):
        return meta_blocking.global_psnm(
            blocks, self.budget if budget is None else budget,
            window=self.window, max_window=self.max_window,
        )


class LocalPSNM(GlobalPSNM):
    """prioritization.py:913-951."""

    def predict(self, blocks, data=None, budget=None):
        return meta_blocking.local_psnm(
            blocks, self.budget if budget is None else budget,
            window=self.window, max_window=self.max_window,
        )


class TopKJoinPM:
    """prioritization.py:1090-1360 (top-k join neighborhoods through the
    DatasetScheduler emission order)."""

    def __init__(self, K: int = 5, budget: int = 0, algorithm: str = "HB",
                 metric: str = "cosine", tokenization: str = "standard"):
        self.K, self.budget = K, budget
        self.algorithm, self.metric, self.tokenization = algorithm, metric, tokenization

    def predict(self, data: Data, budget: int | None = None):
        return joins.topk_join_pm(
            data.docs, self.budget if budget is None else budget,
            k=self.K, strategy=self.algorithm, metric=self.metric,
            tokenization=self.tokenization, num_partitions=_DEFAULT_PARTITIONS,
        )


class EmbeddingsNNBPM:
    """prioritization.py:622-842 (encode -> quantize -> bucket kNN ->
    TOP/DFS/BFS/HB emission; encoder kernel stubbed in this environment)."""

    def __init__(self, budget: int = 0, algorithm: str = "HB", top_k: int = 5,
                 dim: int = 64, n_clusters: int = 8):
        self.budget, self.algorithm, self.top_k = budget, algorithm, top_k
        self.dim, self.n_clusters = dim, n_clusters

    def predict(self, data: Data, budget: int | None = None):
        from .stages.encoding import embeddings_nn_bpm

        return embeddings_nn_bpm(
            data.docs, self.budget if budget is None else budget,
            strategy=self.algorithm, k=self.top_k, dim=self.dim,
            n_clusters=self.n_clusters,
        )


# --------------------------------------------------------------- evaluation --


class Evaluation:
    """Reference ``Evaluation`` (evaluation.py:54-79): P/R/F1 of a predicted
    pair or cluster result against ``Data.ground_truth`` (original-id pairs,
    stringified + deduped like datamodel.py:158-160)."""

    def __init__(self, data: Data):
        if data.ground_truth is None:
            raise ValueError("Data was constructed without ground_truth")
        self.data = data
        gt = data.ground_truth.astype(str).drop_duplicates()
        back = {orig: i for i, orig in enumerate(data._orig_ids[: data.dataset_limit])}
        back2 = (
            {orig: i + data.dataset_limit
             for i, orig in enumerate(data._orig_ids[data.dataset_limit:])}
            if not data.is_dirty_er else back
        )
        c1, c2 = gt.columns[:2]
        self._gt = ray.data.from_arrow(
            pa.table(
                {
                    "id1": pa.array([back[v] for v in gt[c1]], pa.int64()),
                    "id2": pa.array([back2[v] for v in gt[c2]], pa.int64()),
                }
            )
        )

    def report(self, prediction: ray.data.Dataset) -> dict:
        """prediction: (id1, id2[, weight]) pairs or (doc_id, cluster_id)
        clusters; returns the reference's P/R/F1 counters."""
        from .stages import evaluate as ev

        cols = prediction.columns() or []
        pairs = (
            ev.clusters_to_pairs(prediction, _DEFAULT_PARTITIONS)
            if "cluster_id" in cols
            else prediction
        )
        return ev.evaluate_pairs(pairs, self._gt, _DEFAULT_PARTITIONS)


# --------------------------------------------------------------- clustering --


class _Clusterer:
    _fn = None
    _default_threshold = 0.1

    def process(self, graph: ray.data.Dataset, data: Data | None = None,
                similarity_threshold: float | None = None, **kw):
        t = self._default_threshold if similarity_threshold is None else similarity_threshold
        return type(self)._fn(graph, t, **kw)

    def export_to_df(self, clusters: ray.data.Dataset, data: Data) -> pd.DataFrame:
        """Cluster Dataset -> intra-cluster pair list in original ids
        (clustering.py:381-417 export semantics)."""
        df = _guarded_to_pandas(clusters, "Clusterer.export_to_df")
        rows = []
        for _, grp in df.groupby("cluster_id"):
            ids = sorted(grp["doc_id"].tolist())
            rows += [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        out = pd.DataFrame(rows, columns=["id1", "id2"])
        return pd.DataFrame(
            {"id1": data.to_original_ids(out["id1"]), "id2": data.to_original_ids(out["id2"])}
        )


class ConnectedComponentsClustering(_Clusterer):
    """clustering.py:431-475."""

    def process(self, graph, data=None, similarity_threshold=None, **kw):
        return clustering.connected_components(graph, threshold=similarity_threshold, **kw)


class UniqueMappingClustering(_Clusterer):
    """clustering.py:477-539 (CCER)."""

    _fn = staticmethod(clustering.unique_mapping_clustering)


class CenterClustering(_Clusterer):
    """clustering.py:568-639."""

    _fn = staticmethod(clustering.center_clustering)
    _default_threshold = 0.5


class BestMatchClustering(_Clusterer):
    """clustering.py:641-727."""

    _fn = staticmethod(clustering.best_match_clustering)
    _default_threshold = 0.5


class MergeCenterClustering(_Clusterer):
    """clustering.py:730-791."""

    _fn = staticmethod(clustering.merge_center_clustering)
    _default_threshold = 0.5


class CorrelationClustering(_Clusterer):
    """clustering.py:793-1005."""

    def process(self, graph, data=None, similarity_threshold=None, **kw):
        return clustering.correlation_clustering(graph, **kw)


class CutClustering(_Clusterer):
    """clustering.py:1007-1053."""

    _fn = staticmethod(clustering.cut_clustering)
    _default_threshold = 0.5

    def __init__(self, alpha: float = 0.2):
        self.alpha = alpha

    def process(self, graph, data=None, similarity_threshold=None, **kw):
        t = self._default_threshold if similarity_threshold is None else similarity_threshold
        return clustering.cut_clustering(graph, t, alpha=kw.get("alpha", self.alpha))


class MarkovClustering(_Clusterer):
    """clustering.py:1055-1171."""

    _fn = staticmethod(clustering.markov_clustering)
    _default_threshold = 0.5


class KiralyMSMApproximateClustering(_Clusterer):
    """clustering.py:1173-1341 (CCER)."""

    _fn = staticmethod(clustering.kiraly_clustering)


class RicochetSRClustering(_Clusterer):
    """clustering.py:1343-1490 (CCER)."""

    _fn = staticmethod(clustering.ricochet_sr_clustering)
    _default_threshold = 0.5


class RowColumnClustering(_Clusterer):
    """clustering.py:1493-1633 (CCER)."""

    _fn = staticmethod(clustering.row_column_clustering)
    _default_threshold = 0.5


class SpatialData:
    """Reference ``SpatialData`` (datamodel.py:372-395) analog over envelope
    DataFrames with columns (minx, miny, maxx, maxy) and an optional id
    column (row position otherwise). The reference parses WKT via shapely —
    env-limited here; at the MBR level the spatial workflow is exact (see
    stages/spatial.py module doc)."""

    def __init__(self, source: pd.DataFrame, target: pd.DataFrame, id_column: str | None = None):
        self.source = self._to_ds(source, id_column)
        self.target = self._to_ds(target, id_column)
        self.source_geometries_size = len(source)
        self.target_geometries_size = len(target)

    @staticmethod
    def _to_ds(df: pd.DataFrame, id_column: str | None) -> ray.data.Dataset:
        from .stages.spatial import BOX_COLS

        missing = [c for c in BOX_COLS if c not in df.columns]
        if missing:
            raise ValueError(f"SpatialData frame missing envelope columns {missing}")
        out = pd.DataFrame(
            {
                "gid": (df[id_column] if id_column else range(len(df))),
                **{c: df[c].astype(float) for c in BOX_COLS},
            }
        )
        return ray.data.from_pandas(out)


class StandardSpatialFiltering:
    """spatial/filtering.py:34-68: equigrid setup. ``process`` returns the
    grid thetas; the spatial index itself is implicit in the distributed
    cell-key shuffle (a driver-side defaultdict grid would be the scale
    anti-pattern this engine exists to avoid)."""

    def process(self, spatial_data: SpatialData) -> tuple[float, float]:
        from .stages import spatial as _spatial

        self.theta_x, self.theta_y = _spatial.mean_extents(spatial_data.source)
        return self.theta_x, self.theta_y


class StandardSpatialInitialization:
    """spatial/initialization.py:31-66: budgeted top-K weighted candidates.
    wScheme in {CF, JS_APPROX, MBR}; boundary ties break deterministically
    by (id1, id2) instead of heap insertion order (documented deviation)."""

    def __init__(self, budget: int, wScheme: str = "CF"):
        self.budget = budget
        self.wScheme = wScheme

    def process(
        self,
        spatial_data: SpatialData,
        theta_x: float | None = None,
        theta_y: float | None = None,
    ) -> ray.data.Dataset:
        from .stages import spatial as _spatial

        self.top_pairs = _spatial.spatial_join(
            spatial_data.source,
            spatial_data.target,
            budget=self.budget,
            weight_scheme=self.wScheme,
            num_partitions=_DEFAULT_PARTITIONS,
        )
        return self.top_pairs

    def export_to_df(self) -> pd.DataFrame:
        return _guarded_to_pandas(self.top_pairs, "StandardSpatialInitialization")


class ValentineSchemaMatching:
    """schema/matching.py:101-152 facade: delegation to valentine's matchers
    — env-gated (valentine is not installed here; construction raises with
    instructions). Native distributed analogs: JaccardSchemaMatching below /
    stages.schema_matching.tfidf_top_tokens."""

    def __init__(self, matcher=None):
        from .stages.schema_matching import ValentineMatcherStub

        self._stub = ValentineMatcherStub()  # raises ImportError without valentine
        self.matcher = matcher

    def process(self, data) -> list:  # pragma: no cover - env-limited
        import valentine

        self.matches = valentine.valentine_match(
            data.dataset_1, data.dataset_2, self.matcher
        )
        return [
            [x[0][1] for x in self.matches.keys()],
            [x[1][1] for x in self.matches.keys()],
        ]


class JaccardSchemaMatching:
    """Native JaccardDistanceMatcher analog (schema/matching.py:92-93):
    column similarity = Jaccard of distinct value-token sets, distributed.
    process takes two pandas DataFrames (reference Schema shape) and returns
    the full column-pair matrix as a DataFrame."""

    def __init__(self, columns1: list[str] | None = None, columns2: list[str] | None = None):
        self.columns1 = columns1
        self.columns2 = columns2

    def process(self, df1: pd.DataFrame, df2: pd.DataFrame) -> pd.DataFrame:
        from .stages.schema_matching import jaccard_schema_matching

        self.matches = jaccard_schema_matching(
            ray.data.from_pandas(df1),
            ray.data.from_pandas(df2),
            columns1=self.columns1 or list(df1.columns),
            columns2=self.columns2 or list(df2.columns),
            num_partitions=_DEFAULT_PARTITIONS,
        )
        return _guarded_to_pandas(self.matches, "JaccardSchemaMatching")

    def get_matches(self) -> dict:
        df = _guarded_to_pandas(self.matches, "JaccardSchemaMatching")
        return {
            (r.col1, r.col2): r.jaccard for r in df.itertuples(index=False)
        }
