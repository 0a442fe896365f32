"""``ray job submit`` entrypoint for the flagship web-dedup pipeline.

The north rule's deployment shape is a fixed-size multi-node Ray cluster
driven by Ray's job API; this module is the submittable driver:

  ray job submit --working-dir . -- \\
      python -m pyjedai_ray.job --input /data/webpages --out /data/dedup \\
          --lang en --num-partitions 512

Inside the job, ``ray.init()`` with no address connects to the hosting
cluster (standalone invocations fall back to a local session). Every stage
checkpoints under ``--out`` (partitioned Parquet + per-partition lineage
manifest, pipelines/checkpoint.py), so re-submitting the same job after a
failure resumes from the last stage whose manifest validates; capped-path
drop totals land in the candidates stage manifest and the final summary.

The driver prints ONE JSON summary line (doc/cluster counts, lineage chain,
drop metrics) — the machine-readable contract for whatever submitted the job.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m pyjedai_ray.job",
        description="MinHash-LSH web dedup over Common-Crawl-shaped Parquet "
        "(url, warc_ts, html, text, lang) -> duplicate clusters",
    )
    p.add_argument("--input", required=True, help="input Parquet path/dir")
    p.add_argument("--out", required=True, help="checkpoint + output directory")
    p.add_argument("--lang", default=None, help="restrict to one language code")
    p.add_argument(
        "--tiers",
        default=None,
        help="run the tiered dedup CASCADE instead of the single MinHash "
        "pass: comma-separated tier names in execution order, e.g. "
        "'quality,url,exact,lines,minhash' (pipelines/tiered.py; 'exact' "
        "must precede 'lines')",
    )
    p.add_argument(
        "--quality-threshold", type=float, default=0.5,
        help="minimum heuristic quality score for the opt-in 'quality' tier",
    )
    p.add_argument(
        "--embeddings", default=None,
        help="Parquet path of (doc_id, embedding) vectors for the opt-in "
        "'semantic' tier (ids must match the corpus doc ids)",
    )
    p.add_argument(
        "--semantic-threshold", type=float, default=0.95,
        help="cosine threshold for the 'semantic' near-dup tier",
    )
    p.add_argument(
        "--removals-out", default=None,
        help="(cascade only) also write the RESOLVED removal provenance — "
        "every removed doc mapped to its FINAL surviving representative "
        "(tiered.resolve_removals) — as Parquet under this directory",
    )
    p.add_argument(
        "--eval-set", default=None,
        help="Parquet path of benchmark/eval documents: after dedup, remove "
        "surviving train docs overlapping this set "
        "(stages/decontaminate.py; contaminated counts land in the summary "
        "and drop metrics, survivors in <out>/decontaminated)",
    )
    p.add_argument("--decon-mode", default="ngram", choices=["ngram", "exact"],
                   help="decontamination rule: n-gram collision or exact "
                   "normalized text")
    p.add_argument("--decon-ngram", type=int, default=13,
                   help="n for --decon-mode ngram (GPT-3 used 13)")
    p.add_argument("--eval-text-col", default="text",
                   help="text column name in --eval-set")
    p.add_argument("--no-resume", action="store_true",
                   help="recompute every stage even if manifests validate")
    p.add_argument("--no-html", action="store_true",
                   help="trust the text column instead of re-extracting from html")
    p.add_argument("--num-partitions", type=int, default=32,
                   help="shuffle width; size so one partition fits a worker heap")
    p.add_argument("--signer-batch-size", type=int, default=256)
    p.add_argument("--verify-mode", default="auto",
                   choices=["auto", "broadcast", "join"])
    p.add_argument("--cluster-mode", default="auto",
                   choices=["auto", "driver", "distributed"])
    # DedupConfig knobs (north rule: identical shingle/signature configs)
    p.add_argument("--shingle-k", type=int, default=5)
    p.add_argument("--num-perms", type=int, default=128)
    p.add_argument("--bands", type=int, default=16)
    p.add_argument("--rows", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max-block-size", type=int, default=64)
    p.add_argument("--verify-threshold", type=float, default=0.8)
    return p


def _apply_decontamination(args, cfg, res, summary) -> dict:
    """Post-dedup benchmark decontamination (--eval-set): filter the
    surviving corpus against the eval set, write <out>/decontaminated (the
    stage manifest's config hash folds in mode/n/eval path, so a resubmit
    against a different eval set or rule rewrites it), and extend the
    summary. Runs AFTER dedup — the eval grams broadcast against the already
    -shrunk corpus."""
    if not args.eval_set:
        return summary
    import ray.data

    from .pipelines import checkpoint as ckpt
    from .stages.decontaminate import decontaminate
    from .state.metrics import read_drops, reset_drops

    ev = ray.data.read_parquet(args.eval_set, columns=[args.eval_text_col])
    counter = f"decon:{cfg.config_hash()}"
    reset_drops(counter)
    r = decontaminate(
        res["docs"],
        ev,
        mode=args.decon_mode,
        n=args.decon_ngram,
        text_col="text",
        eval_text_col=args.eval_text_col,
        drop_counter=counter,
    )
    blob = (
        f"{cfg.config_hash()}|decon|{args.decon_mode}|{args.decon_ngram}"
        f"|{args.eval_set}|{args.eval_text_col}"
    )
    m = ckpt.write_stage(
        r["survivors"], f"{args.out}/decontaminated", "decontaminated",
        blob, res["lineage"],
    )
    summary["eval_set"] = args.eval_set
    summary["decon_mode"] = args.decon_mode
    summary["n_docs_final"] = m["row_count"]
    summary["n_decontaminated"] = summary["n_docs"] - m["row_count"]
    summary["drop_metrics"] = {
        **summary["drop_metrics"],
        **{f"decon_{k}": v for k, v in read_drops(counter).items()},
    }
    return summary


def main(argv: list[str] | None = None) -> dict:
    args = build_parser().parse_args(argv)

    import ray

    if not ray.is_initialized():
        # under `ray job submit` this attaches to the hosting cluster
        # (RAY_ADDRESS is set by the job runtime); standalone it starts a
        # local session
        ray.init(include_dashboard=False, logging_level="ERROR")
    import ray.data

    from .config import DedupConfig
    from .pipelines.webdedup import run_webdedup

    cfg = DedupConfig(
        shingle_k=args.shingle_k,
        num_perms=args.num_perms,
        bands=args.bands,
        rows=args.rows,
        seed=args.seed,
        max_block_size=args.max_block_size,
        verify_threshold=args.verify_threshold,
    )
    # prune at the read: extraction consumes at most (url, html, text, lang);
    # html — by far the widest column — never leaves storage under --no-html
    needed = ["url", "text", "lang"] + ([] if args.no_html else ["html"])
    have = set(ray.data.read_parquet(args.input).schema().names)
    webpages = ray.data.read_parquet(
        args.input, columns=[c for c in needed if c in have]
    )
    if args.tiers:
        from .pipelines.tiered import run_tiered_dedup

        tiers = tuple(t.strip() for t in args.tiers.split(",") if t.strip())
        if not tiers:
            raise SystemExit(
                f"--tiers {args.tiers!r} parsed to zero tiers — a typo here "
                "must not silently produce an un-deduplicated corpus"
            )
        res = run_tiered_dedup(
            webpages,
            cfg,
            tiers=tiers,
            out_dir=args.out,
            resume=not args.no_resume,
            num_partitions=args.num_partitions,
            signer_batch_size=args.signer_batch_size,
            verify_mode=args.verify_mode,
            cluster_mode=args.cluster_mode,
            use_html=not args.no_html,
            lang_filter=args.lang,
            quality_threshold=args.quality_threshold,
            embeddings=(
                ray.data.read_parquet(args.embeddings) if args.embeddings else None
            ),
            semantic_threshold=args.semantic_threshold,
            # fold the embeddings file identity into the cascade's config
            # hash: a resubmit against a different embeddings file must
            # invalidate the semantic tier's checkpoints
            source_id=args.embeddings,
        )
        summary = {
            "metric": "tiered_dedup_job",
            "out": args.out,
            "config_hash": cfg.config_hash(),
            "lineage": res["lineage"],
            "tier_stats": res["tier_stats"],
            "n_docs": res["docs"].count(),
            "n_clustered": (
                res["clusters"].count() if res["clusters"] is not None else None
            ),
            "drop_metrics": res["drop_metrics"](),
        }
        if args.removals_out:
            from .pipelines import checkpoint as ckpt
            from .pipelines.tiered import resolve_removals

            try:
                resolved = resolve_removals(
                    res["removals"], tiers, num_partitions=args.num_partitions
                )
            except ValueError as e:
                # a resumed tier lost its provenance side table — a partial
                # export would silently omit that tier's removals AND point
                # earlier tiers at docs it removed; report why instead
                resolved = None
                summary["removals_error"] = str(e)
            if resolved is not None:
                # write_stage (not a bare write_parquet): clears a previous
                # run's files from the target dir and stamps a manifest, so
                # resubmissions never accumulate mixed-run provenance rows
                m = ckpt.write_stage(
                    resolved, args.removals_out, "resolved_removals",
                    cfg.config_hash(), res["lineage"],
                )
                summary["n_removed"] = m["row_count"]
                summary["removals_out"] = args.removals_out
            else:
                summary["n_removed"] = None
                summary["removals_out"] = None
        summary = _apply_decontamination(args, cfg, res, summary)
        print(json.dumps(summary))
        return summary

    res = run_webdedup(
        webpages,
        cfg,
        out_dir=args.out,
        resume=not args.no_resume,
        num_partitions=args.num_partitions,
        signer_batch_size=args.signer_batch_size,
        verify_mode=args.verify_mode,
        cluster_mode=args.cluster_mode,
        use_html=not args.no_html,
        lang_filter=args.lang,
    )
    summary = {
        "metric": "webdedup_job",
        "out": args.out,
        "config_hash": cfg.config_hash(),
        "lineage": res["lineage"],
        "n_docs": res["docs"].count(),
        "n_candidates": res["candidates"].count(),
        "n_verified": res["verified"].count(),
        "n_clustered": res["clusters"].count(),
        "drop_metrics": res["drop_metrics"](),
    }
    summary = _apply_decontamination(args, cfg, res, summary)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
