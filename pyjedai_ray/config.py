"""Pipeline configuration.

The north rule requires dup-pair recall >= 0.99 vs the reference semantics *at
identical shingle/signature configs*, so every stochastic knob (hash seeds,
permutation seeds, band layout) is pinned here and threaded through both the
Ray pipeline and the in-memory test oracle.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    """Shingle / MinHash / SimHash / verification configuration.

    Defaults target near-dup detection at Jaccard ~0.8 on k-word shingles:
    b=16 bands x r=8 rows -> P(collide | J=0.8) ~ 0.947 per the S-curve, and
    exact-Jaccard verification at ``verify_threshold`` restores precision.
    """

    # shingling
    shingle_k: int = 5            # words per shingle
    # minhash
    num_perms: int = 128
    bands: int = 16
    rows: int = 8                 # bands * rows must == num_perms
    seed: int = 42
    # simhash
    simhash_bits: int = 64
    simhash_hamming_max: int = 3  # candidate if hamming distance <= this
    # candidate generation
    max_block_size: int = 64      # LSH bucket cap before fallback emission
    # verification
    verify_threshold: float = 0.8  # exact Jaccard on shingle sets
    # texts shorter than this many tokens fall back to whole-text key
    min_tokens: int = 1

    def __post_init__(self) -> None:
        if self.bands * self.rows != self.num_perms:
            raise ValueError(
                f"bands*rows ({self.bands}*{self.rows}) != num_perms ({self.num_perms})"
            )

    def config_hash(self) -> str:
        """Stable hash of the config — stamped into checkpoint manifests."""
        blob = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.blake2b(blob, digest_size=8).hexdigest()


@dataclass(frozen=True)
class RuntimeConfig:
    """Per-stage Ray execution knobs (sized for a 32-cpu node; scale by
    setting concurrency ~ cluster cpus - 2 for cpu-bound actor stages)."""

    signer_batch_size: int = 256
    signer_concurrency: int | None = None   # None -> Ray autoscales tasks
    verify_batch_size: int = 4096
    pair_group_batch: int = 65536
