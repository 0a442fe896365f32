"""Counted drop metrics (SURVEY §4: "logged drop counters — no silent
truncation"): every capped path reports EXACTLY how many pairwise
comparisons its cap discarded — LSH/blocking oversized blocks in all three
fallback modes, the joins' ultra-frequent-token drop, the IVF hot-cell split,
and the webdedup stage-manifest surfacing."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from pyjedai_ray.state.metrics import read_drops, reset_drops

pytestmark = pytest.mark.usefixtures("ray_session")


def _hot_key_edges(n: int) -> ray.data.Dataset:
    """One block: a single key shared by docs 0..n-1."""
    return ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array(["hot"] * n, pa.string()),
                "doc_id": pa.array(np.arange(n), pa.int64()),
            }
        )
    )


def _consume(ds) -> int:
    return ds.count()


def test_candidate_pairs_chain_drop_count(ray_session):
    from pyjedai_ray.stages import blocking

    name = "t_drops_chain"
    reset_drops(name)
    n, cap = 10, 4
    out = blocking.candidate_pairs(
        _hot_key_edges(n), max_block_size=cap, num_partitions=4,
        chain_oversize=True, drop_counter=name,
    )
    emitted = _consume(out)
    assert emitted == n - 1  # the connectivity chain
    totals = read_drops(name)["oversized_blocks"]
    assert totals["events"] == 1
    assert totals["dropped_comparisons"] == n * (n - 1) // 2 - (n - 1)


def test_candidate_pairs_salt_drop_count(ray_session):
    from pyjedai_ray.stages import blocking

    name = "t_drops_salt"
    reset_drops(name)
    n, cap = 10, 4
    out = blocking.candidate_pairs(
        _hot_key_edges(n), max_block_size=cap, num_partitions=4,
        chain_oversize=False, salt_oversize=True, drop_counter=name,
    )
    # salts = id % ceil(10/4)=3 -> sub-groups {0,3,6,9},{1,4,7},{2,5,8}:
    # 6+3+3 full pairs + 9 chain edges, all distinct pairs
    emitted = _consume(out)
    assert emitted == 6 + 3 + 3 + 9
    totals = read_drops(name)["oversized_blocks"]
    assert totals["dropped_comparisons"] == n * (n - 1) // 2 - emitted


def test_candidate_pairs_hard_drop_count(ray_session):
    from pyjedai_ray.stages import blocking

    name = "t_drops_hard"
    reset_drops(name)
    n, cap = 10, 4
    out = blocking.candidate_pairs(
        _hot_key_edges(n), max_block_size=cap, num_partitions=4,
        chain_oversize=False, drop_counter=name, drop_key="token_freq_cap",
    )
    assert _consume(out) == 0  # the whole block is dropped
    totals = read_drops(name)["token_freq_cap"]
    assert totals["events"] == 1
    assert totals["dropped_comparisons"] == n * (n - 1) // 2


def test_ejoin_token_freq_drop_count(ray_session):
    """An ultra-frequent token above max_token_freq drops C(n,2) potential
    common-count contributions — counted, not silent."""
    from pyjedai_ray.stages import joins

    name = "t_drops_ejoin"
    reset_drops(name)
    n = 6
    # every doc shares token "common" (freq 6 > cap 4); pairs still join on
    # their rarer tokens
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(
                    [f"common rare{i // 2} filler{i}" for i in range(n)], pa.string()
                ),
            }
        )
    )
    out = joins.ejoin(
        docs, threshold=0.1, metric="jaccard", max_token_freq=4,
        num_partitions=4, drop_counter=name,
    )
    got = {(r["id1"], r["id2"]) for r in out.take_all()}
    # only the rareK-sharing pairs survive the drop of "common"
    assert got == {(0, 1), (2, 3), (4, 5)}
    totals = read_drops(name)["token_freq_cap"]
    assert totals["events"] == 1
    assert totals["dropped_comparisons"] == n * (n - 1) // 2


def test_ivf_split_drop_count(ray_session):
    """Hot-coarse-cell split mode counts the cross-sub-cell comparisons it
    forgoes: C(n,2) - sum C(n_i,2)."""
    from pyjedai_ray.stages.encoding import embeddings_nn_blocking

    name = "t_drops_ivf"
    reset_drops(name)
    n, max_bucket = 10, 4
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array([f"alpha beta w{i}" for i in range(n)], pa.string()),
            }
        )
    )
    out = embeddings_nn_blocking(
        docs, k=2, dim=8, n_clusters=1, max_bucket=max_bucket,
        oversize_mode="split", drop_counter=name,
    )
    assert _consume(out) > 0
    # n_clusters=1 -> one cell of 10 > 4 -> n_sub=3, sub-sizes by id%3: 4,3,3
    sizes = np.bincount(np.arange(n) % 3)
    expected = n * (n - 1) // 2 - sum(int(s) * (int(s) - 1) // 2 for s in sizes)
    totals = read_drops(name)["ivf_split_cells"]
    assert totals["events"] == 1
    assert totals["dropped_comparisons"] == expected


def test_webdedup_manifest_carries_drop_metrics(tmp_path, ray_session):
    """A forced-hot corpus (many identical texts, tiny band cap) surfaces a
    NONZERO dropped-comparisons total in the candidates stage manifest."""
    from pyjedai_ray.config import DedupConfig
    from pyjedai_ray.pipelines import checkpoint as ckpt
    from pyjedai_ray.pipelines.webdedup import run_webdedup

    n = 12
    wp = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([f"https://ex.com/{i}" for i in range(n)], pa.string()),
                "text": pa.array(
                    ["the same exact page text for every single url here"] * n,
                    pa.string(),
                ),
            }
        )
    )
    cfg = DedupConfig(max_block_size=4)
    out_dir = str(tmp_path / "run")
    res = run_webdedup(
        wp, cfg, out_dir=out_dir, use_html=False, num_partitions=4,
        cluster_mode="driver", verify_mode="broadcast",
    )
    res["clusters"].count()  # consume
    m = ckpt.read_manifest(f"{out_dir}/candidates")
    drops = m["metrics"]["drop_metrics"]
    assert drops["lsh_band_cap"]["dropped_comparisons"] > 0
    assert drops["lsh_band_cap"]["events"] > 0
    # the live view agrees
    live = res["drop_metrics"]()
    assert live["lsh_band_cap"]["dropped_comparisons"] >= drops["lsh_band_cap"]["dropped_comparisons"]


def test_drop_counter_survives_ray_reinit():
    """A process that does ray.shutdown(); ray.init() (notebook pattern) must
    get a FRESH counter, not a RayActorError from a dead-actor handle cached
    across sessions (VERDICT r4 #4). Runs in a subprocess so the session
    fixture's Ray stays untouched."""
    import subprocess
    import sys

    script = r"""
import ray
from pyjedai_ray.state.metrics import read_drops, report_drops
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
report_drops("reinit_test", "k", 5)
assert read_drops("reinit_test")["k"]["dropped_comparisons"] == 5
ray.shutdown()
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
report_drops("reinit_test", "k", 7)  # raised RayActorError before the fix
totals = read_drops("reinit_test")
assert totals["k"]["dropped_comparisons"] == 7, totals  # fresh session, fresh counter
ray.shutdown()
print("REINIT_OK")
"""
    p = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300
    )
    assert p.returncode == 0, p.stderr[-2000:]
    assert "REINIT_OK" in p.stdout
