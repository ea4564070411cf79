"""Persistent (genome, seed) -> fitness cache for mid-generation crash
recovery.

The search drivers checkpoint once per generation (algorithms/*.py), so a
crash INSIDE a generation — e.g. a remote-TPU worker dying during the
15-genome init evaluation, minutes of device work at BirdCLEF feature
shapes — loses every training that already finished. The reference has the
same exposure (its loop has no checkpointing at all, sa_nsga_penalty.py:
237-253); here we can do better because this engine's evaluations are
idempotent BY CONSTRUCTION: model inits are genome-keyed and dropout
streams are uid-keyed, so the same (genome, seed) produces the same
fitness regardless of bucketing, padding, population composition, or
compaction (pinned by tests/test_compaction.py::
test_training_invariant_to_population_composition). Replaying a finished
training's fitness from disk is therefore behaviorally invisible — a
resumed generation trains only the lanes that never completed.

Format: JSONL. Line 1 is a header ``{"fingerprint": {...}}`` binding the
cache to everything a fitness DOES depend on (training budget, optimizer
settings, template, dtype, data-mesh width, dataset content hash).
Execution-strategy knobs that are invariance-pinned NOT to affect results
(bucket_genes, padding, parallel_impl, compaction, launch budget) are
deliberately excluded — that exclusion is exactly the invariant the test
suite enforces.

TPU numerics caveat (bisected 2026-08-19, PERF.md round-4 notes): the
composition invariance is bitwise on CPU at every setting, and bitwise on
TPU for lane order / launch membership under a FIXED compiled program
shape — but a launch whose depth specialization level (BucketSpec.
max_blocks) differs compiles a different XLA program, whose matmul
tiling rounds differently on TPU (any precision, bf16 or f32); over a
training run that drift occasionally shifts an early-stop epoch and moves
accuracy by ~1 validation sample (|Δacc| ≈ 0.002-0.014 observed). Resume
replays the SAME run's launch plan, so crash recovery stays exact; only
cross-composition reuse (the same genome re-arriving beside different
bucket-mates) can differ from a fresh launch, well inside cross-seed
evaluation noise. Subsequent lines are one completed training each:
``{"g": [genes in GENE_ORDER], "seed": s, "acc": a, "size": m, "fpr": f}``.
Appends are flushed+fsync'd per batch; a truncated final line (crash
mid-append) is skipped on load.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..core.genome import GENE_ORDER, Genome, genome_key

Fitness = Tuple[float, float, float]


def dataset_fingerprint(data: Dict[str, np.ndarray]) -> str:
    """Content hash of the splits the evaluator trains/validates on."""
    h = hashlib.blake2b(digest_size=16)
    for k in ("x_train", "y_train", "x_val", "y_val"):
        a = np.ascontiguousarray(data[k])
        h.update(k.encode())
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(a.tobytes())
    return h.hexdigest()


def evaluator_fingerprint(train_cfg, data: Dict[str, np.ndarray],
                          data_axis: int = 1, pop_axis: int = 1) -> Dict:
    """The inputs a cached fitness is valid for.

    ``data_axis`` (the 'data' mesh width) is included because batch-sharded
    runs are only logits-level — not bitwise — equal to single-device runs
    (argmax near-ties may resolve differently under psum reduction order).
    ``pop_axis`` (the 'pop' mesh width) likewise: sharding the population
    changes per-shard group sizes (shard_map'd grouped conv) and program
    tiling, so mesh-vs-no-mesh fitnesses agree only to ~1e-3
    (tests/test_parallel.py pins atol, not equality) — replaying across a
    different pop width would silently mix non-identical fitnesses.
    """
    return {
        "format": 2,
        "pop_axis": int(pop_axis),
        "epochs": int(train_cfg.epochs),
        "batch_size": int(train_cfg.batch_size),
        "patience": int(train_cfg.patience),
        "learning_rate": float(train_cfg.learning_rate),
        "num_classes": int(train_cfg.num_classes),
        "restore_best_weights": bool(train_cfg.restore_best_weights),
        "accuracy_from": str(train_cfg.accuracy_from),
        "template": str(train_cfg.template),
        "dropout_rate": float(train_cfg.dropout_rate),
        "compute_dtype": str(train_cfg.compute_dtype),
        "data_axis": int(data_axis),
        "dataset": dataset_fingerprint(data),
    }


class FitnessCache:
    """Append-only JSONL cache of completed trainings.

    Raises ``ValueError`` if ``path`` already holds a cache written under a
    different fingerprint — resuming a run whose config or data changed
    would silently mix incompatible fitnesses otherwise.
    """

    def __init__(self, path: str, fingerprint: Dict):
        self.path = path
        self.fingerprint = fingerprint
        self._mem: Dict[Tuple[tuple, int], Fitness] = {}
        if os.path.exists(path) and os.path.getsize(path) > 0:
            self._load()
            # Repair a crash-torn tail: a final line without a newline would
            # otherwise concatenate with (and destroy) the next append.
            # Writing the missing newline turns the torn fragment into its
            # own junk line, which every load skips.
            with open(path, "rb+") as f:
                f.seek(-1, os.SEEK_END)
                if f.read(1) != b"\n":
                    f.write(b"\n")
                    f.flush()
                    os.fsync(f.fileno())
        else:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            with open(path, "w") as f:
                f.write(json.dumps({"fingerprint": fingerprint}) + "\n")
                f.flush()
                os.fsync(f.fileno())

    def _load(self) -> None:
        with open(self.path) as f:
            lines = f.read().split("\n")
        try:
            header = json.loads(lines[0])
        except (json.JSONDecodeError, IndexError):
            raise ValueError(
                f"{self.path} is not a fitness cache (unreadable header)"
            )
        if header.get("fingerprint") != self.fingerprint:
            raise ValueError(
                f"fitness cache {self.path} was written under a different "
                "training config / dataset; delete it (or point "
                "--fitness-cache elsewhere) to proceed.\n"
                f"  cached: {header.get('fingerprint')}\n"
                f"  current: {self.fingerprint}"
            )
        for line in lines[1:]:
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue  # truncated final line from a crash mid-append
            self._mem[(tuple(rec["g"]), int(rec["seed"]))] = (
                float(rec["acc"]), float(rec["size"]), float(rec["fpr"])
            )

    def __len__(self) -> int:
        return len(self._mem)

    def get(self, genome: Genome, seed: int) -> Optional[Fitness]:
        return self._mem.get((genome_key(genome), int(seed)))

    def put_many(
        self, entries: Sequence[Tuple[Genome, int, Fitness]]
    ) -> None:
        """Record completed trainings; one durable append per call."""
        new_lines = []
        for genome, seed, fit in entries:
            key = (genome_key(genome), int(seed))
            if key in self._mem:
                continue
            self._mem[key] = tuple(float(v) for v in fit)  # type: ignore
            new_lines.append(json.dumps({
                "g": [genome[g] for g in GENE_ORDER],
                "seed": int(seed),
                "acc": float(fit[0]),
                "size": float(fit[1]),
                "fpr": float(fit[2]),
            }))
        if not new_lines:
            return
        with open(self.path, "a") as f:
            f.write("\n".join(new_lines) + "\n")
            f.flush()
            os.fsync(f.fileno())
