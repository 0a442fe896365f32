"""Deterministic Common-Crawl-shaped corpus synthesizer (FIXTURES.md F1).

Derives a webpages table ``(url:string, warc_ts:timestamp[us], html:binary,
text:large_string, lang:string)`` from the driver-provided ``documents``
table, injecting duplicates with KNOWN ground truth:

* exact duplicates        (same text, different url)      — doc_id % 20 == 0
* near duplicates         (seeded token substitutions)    — doc_id % 20 in {1,2,3}
* boilerplate hot-key stressor (shared header/footer)     — doc_id % 10 < 3
* singletons              — the rest

Every output row is a pure function of (input row, fixed seed): generation is
a Ray Data ``flat_map``-style ``map_batches`` so the corpus is byte-identical
at any parallelism level, and ``html`` is built so ``extract_text(html) ==
text`` exactly (the input_hint byte-identity invariant).

Ground-truth sidecar: ``gt_clusters(doc_id, cluster_id)`` with
``cluster_id = min(doc_id)`` of the duplicate group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import splitmix64

DUP_ID_OFFSET = 1 << 40  # variant v of base doc d gets doc_id = d + v * OFFSET
_BASE_TS_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds

_SUBST_VOCAB = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lamda mu nu xi omicron pi rho sigma tau upsilon"
).split()

_BOILER_HEADER = "site navigation home products about contact login search menu"
_BOILER_FOOTER = "copyright terms privacy cookie policy all rights reserved"


def _mutate(tokens: list[str], rate: float, rng_seed: int) -> list[str]:
    """Substitute ~rate of tokens with vocab words, seeded deterministically."""
    h = splitmix64(np.arange(len(tokens), dtype=np.uint64) + np.uint64(rng_seed))
    out = list(tokens)
    thresh = np.uint64(int(rate * 2**64))
    for i in np.nonzero(h < thresh)[0]:
        out[i] = _SUBST_VOCAB[int(h[i]) % len(_SUBST_VOCAB)]
    return out


def _make_html(text: str, doc_id: int) -> bytes:
    title = f"page {doc_id}"
    return (
        b"<html><head><title>" + title.encode() + b"</title></head><body><p>"
        + text.encode("utf-8") + b"</p></body></html>"
    )


def _rows_for_doc(doc_id: int, text: str, lang: str, expand: int) -> list[dict]:
    rows = []
    base_text = text
    if doc_id % 10 < 3:  # boilerplate stressor on ~30% of docs
        base_text = f"{_BOILER_HEADER} {base_text} {_BOILER_FOOTER}"

    def emit(did: int, t: str) -> None:
        rows.append(
            {
                "doc_id": did,
                "url": f"https://site{did % 997}.example/p/{did}",
                "warc_ts": _BASE_TS_US + did % (1 << 40) + (did >> 40),
                "html": _make_html(t, did),
                "text": t,
                "lang": lang,
                "gt_cluster": doc_id,  # base doc id == cluster id by construction
            }
        )

    for rep in range(expand):
        # expansion replicas are singletons with mutated text (distinct docs)
        did = doc_id + (rep + 10) * DUP_ID_OFFSET if rep else doc_id
        t = base_text
        if rep:
            toks = _mutate(base_text.split(), 0.6, rng_seed=doc_id * 1009 + rep)
            t = " ".join(toks)
            rows.append(
                {
                    "doc_id": did,
                    "url": f"https://site{did % 997}.example/p/{did}",
                    "warc_ts": _BASE_TS_US + (did % (1 << 40)),
                    "html": _make_html(t, did),
                    "text": t,
                    "lang": lang,
                    "gt_cluster": did,  # own cluster
                }
            )
            continue
        emit(did, t)

    mode = doc_id % 20
    if mode == 0:  # exact duplicate
        emit(doc_id + DUP_ID_OFFSET, base_text)
    elif mode in (1, 2, 3):
        # near duplicates: token substitution rate r -> expected shingle
        # Jaccard ~ (1-r)^k / (2-(1-r)^k); rates chosen to land above the
        # 0.8 verify threshold (k=5): ~0.96 / 0.92 / 0.85
        rate = {1: 0.004, 2: 0.008, 3: 0.016}[mode]
        toks = _mutate(base_text.split(), rate, rng_seed=doc_id * 2027 + mode)
        emit(doc_id + DUP_ID_OFFSET, " ".join(toks))
    elif mode == 4:
        # sub-threshold distractor (~J 0.5): same topic, NOT a duplicate —
        # exercises verification precision; own cluster in ground truth
        toks = _mutate(base_text.split(), 0.13, rng_seed=doc_id * 2027 + mode)
        did = doc_id + DUP_ID_OFFSET
        rows.append(
            {
                "doc_id": did,
                "url": f"https://site{did % 997}.example/p/{did}",
                "warc_ts": _BASE_TS_US + (did % (1 << 40)),
                "html": _make_html(" ".join(toks), did),
                "text": " ".join(toks),
                "lang": lang,
                "gt_cluster": did,
            }
        )
    return rows


def _synth_batch(batch: pa.Table, expand: int) -> pa.Table:
    out: list[dict] = []
    for doc_id, text, lang in zip(
        batch["doc_id"].to_pylist(), batch["text"].to_pylist(), batch["lang"].to_pylist()
    ):
        out.extend(_rows_for_doc(int(doc_id), text, lang, expand))
    return pa.Table.from_pylist(
        out,
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("url", pa.string()),
                ("warc_ts", pa.timestamp("us")),
                ("html", pa.binary()),
                ("text", pa.large_string()),
                ("lang", pa.string()),
                ("gt_cluster", pa.int64()),
            ]
        ),
    )


def synthesize_webpages(
    sf_dir: str, expand: int = 1, include_gt: bool = True
) -> ray.data.Dataset:
    """Webpages Dataset derived deterministically from sf_dir/documents.parquet.

    ``expand`` multiplies corpus size (replicas are mutated singletons), for
    throughput benchmarking beyond the driver tables' small row counts.
    Drop ``gt_cluster`` (and ``doc_id``) via select_columns for the pure
    input_hint shape.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return ds.map_batches(
        _synth_batch, fn_kwargs={"expand": expand}, batch_format="pyarrow"
    )


def gt_clusters(webpages: ray.data.Dataset) -> ray.data.Dataset:
    """Ground-truth cluster assignment (doc_id, cluster_id=min doc_id)."""
    return webpages.select_columns(["doc_id", "gt_cluster"]).rename_columns(
        {"gt_cluster": "cluster_id"}
    )
