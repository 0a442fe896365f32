"""Driver-contract regression guards.

Round-5 post-mortem: an unrelated edit inside a query-registration commit
silently flipped two fixture budgets (300 -> 200) and broke two
driver-window rows that had been green since round 4. These tests pin the
two contracts that slip broke:

* the ORDER of the driver's 50-entry correctness window (the driver checks
  the FIRST 50 oracle-backed ``queries()`` entries — reordering or dropping
  one silently changes what CORRECTNESS_r{N} proves);
* the closed-form row counts of the budgeted PES / bilateral fixture
  queries (scale-invariant: the synthesized greedy-4 fixture emits exactly
  its closed-form pair set under budget at every sf).
"""

from pyjedai_ray.entry_queries import oracle_sql, queries

SF = "/root/testdata/sf0.001"

# The driver's correctness pass covers the FIRST 50 oracle-backed entries of
# queries(), in order (entry_queries.py ordering contract). Changing this
# list is a deliberate act — update the pin AND the ordering comment there.
WINDOW_50 = [
    "lang_filter", "token_count", "fingerprint", "exact_dedup",
    "quality_stats", "standard_blocking", "qgram_blocking", "suffix_blocking",
    "extended_suffix_blocking", "block_purging", "block_filtering",
    "shingle_cbs_pairs", "arcs_weights", "url_dedup", "weight_schemes",
    "wep_cbs", "cep_topk", "cnp_topk", "wnp_cbs", "blast_cbs", "rcnp_topk",
    "rwnp_cbs", "progressive_top", "progressive_local_top",
    "progressive_strategies", "ejoin", "ejoin_multiset", "topk_join",
    "topk_join_pm", "pe_topk_join", "cc_lang_chain", "tfidf_weights",
    "tf_boolean_weights", "vector_verify", "knn_embeddings",
    "embedding_neardup", "nn_bpm_emission", "edit_similarity", "psn_fixture",
    "extended_qgram_blocking", "kiraly_clusters", "best_match_pairs",
    "greedy_fixtures", "clusterer_fixtures", "global_psnm_fixture",
    "local_psnm_fixture", "pes_fixture", "bilateral_fixture", "line_dedup",
    "tiered_fixture",
]


def test_driver_window_order_pinned():
    q = queries()
    o = oracle_sql()
    oracle_backed = [k for k in q if k in o]
    assert oracle_backed[:50] == WINDOW_50
    # every oracle key must resolve to a registered query
    assert not [k for k in o if k not in q]


def test_pes_bilateral_fixture_budgets(ray_session):
    q = queries()
    # closed-form greedy-4 fixture: 300 pairs under budget, at every sf
    assert q["pes_fixture"](SF).count() == 300
    assert q["bilateral_fixture"](SF).count() == 300
