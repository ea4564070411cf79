"""Population evaluator: genome list -> (accuracy, size_mb, fpr) fitness.

This is the true-fitness layer (L3) rebuilt TPU-first. Instead of the
reference's serial build/clear_session/fit per individual
(sa_nsga_penalty.py:205-253), genomes are grouped into (filters, kernel)
shape buckets; each bucket's sub-population is padded to a power of two and
trained by ONE cached compiled program (engine/trainer.py). A 15-individual
generation therefore costs at most 6 program launches — typically 2-4 — and
each launch trains its whole sub-population concurrently.

Size is computed analytically from the genome (models/genome_arch.py), never
from materialized parameters, exactly reproducing Keras count_params * 4
bytes (nsga_penalty.py:337-344).

A deterministic FakeEvaluator over the enumerable 288-genome space stands in
for device training in driver tests (SURVEY.md §4 item 4: the
reference-faithful analogue of a fake backend).
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
import zlib
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TrainConfig
from ..core.genome import Genome, genome_key, validate
from ..models.genome_arch import model_size_mb
from ..models.supernet import BucketSpec
from .trainer import (
    TrainSettings,
    gather_lanes,
    make_population_trainer,
    pad_dataset,
)

Fitness = Tuple[float, float, float]  # (acc, size_mb, fpr)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class PopulationEvaluator:
    """Evaluates genome populations on device with per-bucket compiled
    programs and a cross-generation compilation cache."""

    def __init__(
        self,
        data: Dict[str, np.ndarray],
        train_cfg: TrainConfig,
        mesh: Optional["jax.sharding.Mesh"] = None,
        fitness_cache_path: Optional[str] = None,
    ):
        from ..utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        # evaluate() reads bucket-key slots 0/1 as (filters, kernel_size) to
        # build the BucketSpec; a reordered/malformed bucket_genes would
        # silently construct wrong architectures, so fail loudly here
        bg = tuple(train_cfg.bucket_genes)
        if bg[:2] != ("filters", "kernel_size"):
            raise ValueError(
                "bucket_genes must start with ('filters', 'kernel_size'); "
                f"got {bg!r}"
            )
        from ..core.genome import HPARAM_SPACE

        unknown = [g for g in bg if g not in HPARAM_SPACE]
        if unknown:
            raise ValueError(f"unknown bucket_genes {unknown!r}")
        self.cfg = train_cfg
        self.mesh = mesh
        # Multi-host mesh (jax.distributed world): operands must be built as
        # GLOBAL arrays — every process holds the same host value (the data
        # pipeline and flag construction are deterministic), device_put
        # against a mesh-wide sharding assembles the jax.Array from each
        # process's addressable shards, and results come back fully
        # replicated before np.asarray. Single-process behavior (placement,
        # program identity, persistent-cache keys) is untouched.
        self._multiproc = mesh is not None and len(
            {d.process_index for d in mesh.devices.flat}
        ) > 1
        if self._multiproc and int(mesh.shape["data"]) > 1:
            raise NotImplementedError(
                "multi-host meshes support data axis == 1 (population "
                "sharding over processes); shard the batch within a "
                "process's chips instead"
            )
        # Population execution under a mesh: grouped-conv lanes CANNOT shard
        # through GSPMD (the pop axis is merged into conv channels), but they
        # compose with the mesh via shard_map — each device group runs the
        # grouped forward over its own population shard
        # (_get_sharded_run_full). Only a >1 'data' axis still forces vmap
        # lanes: batch-sharded BN statistics/grad psums rely on GSPMD's
        # automatic collectives, which shard_map would require by hand.
        impl = train_cfg.parallel_impl
        if mesh is not None and int(mesh.shape["data"]) > 1:
            impl = "vmap"
        self.settings = TrainSettings(
            epochs=train_cfg.epochs,
            batch_size=train_cfg.batch_size,
            patience=train_cfg.patience,
            learning_rate=train_cfg.learning_rate,
            restore_best_weights=train_cfg.restore_best_weights,
            parallel_impl=impl,
            compaction_chunk=train_cfg.compaction_chunk,
            launch_seconds_budget=train_cfg.launch_seconds_budget,
        )
        # pre-pad datasets once; device transfer happens lazily on first use
        xtr, ytr, wtr = pad_dataset(
            data["x_train"], data["y_train"], train_cfg.batch_size
        )
        xval, yval, wval = pad_dataset(
            data["x_val"], data["y_val"], self.settings.eval_batch_size
        )
        # with a >1 'data' mesh axis the dataset rows shard over it (GSPMD
        # inserts the gradient/metric psums over ICI — SURVEY.md §2.3
        # "sharding the training batch when one model saturates a chip")
        n_data = int(mesh.shape["data"]) if mesh is not None else 1
        if n_data > 1:
            if (
                train_cfg.batch_size % n_data
                or self.settings.eval_batch_size % n_data
            ):
                raise ValueError(
                    f"batch sizes ({train_cfg.batch_size}, "
                    f"{self.settings.eval_batch_size}) must divide by the "
                    f"'data' mesh axis ({n_data})"
                )
            from ..parallel.mesh import batch_sharding

            rows = batch_sharding(mesh)
            place = lambda a: jax.device_put(np.asarray(a), rows)  # noqa: E731
        elif self._multiproc:
            from ..parallel.mesh import replicated

            rep = replicated(mesh)
            place = lambda a: jax.device_put(np.asarray(a), rep)  # noqa: E731
        else:
            place = jnp.asarray
        self._train = (place(xtr), place(ytr), place(wtr))
        self._val = (place(xval), place(yval), place(wval))
        # Optional durable (genome, seed) -> fitness cache: completed
        # trainings survive a mid-generation crash and are replayed on
        # resume — sound because evaluations are idempotent (see
        # utils/fitness_cache.py). Fingerprinted against the RAW (pre-
        # padding) splits + every result-affecting config field.
        self.fitness_cache = None
        if fitness_cache_path:
            from ..utils.fitness_cache import (
                FitnessCache,
                evaluator_fingerprint,
            )

            n_pop_axis = int(mesh.shape["pop"]) if mesh is not None else 1
            self.fitness_cache = FitnessCache(
                fitness_cache_path,
                evaluator_fingerprint(train_cfg, data, n_data, n_pop_axis),
            )
        self._compiled: Dict[tuple, "jax.stages.Wrapped"] = {}
        self._eval_count = 0
        self._launch_count = 0  # device-program dispatches this evaluate()
        self.timings: List[Dict] = []
        # genome -> last observed epochs_ran (stop-epoch packing predictor)
        self._epoch_history: Dict[tuple, float] = {}

    # -- caching --------------------------------------------------------------

    def _bucket_spec(self, f: int, k: int, max_blocks: int = 3) -> BucketSpec:
        return BucketSpec(
            template=self.cfg.template,
            filters=f,
            kernel=k,
            num_classes=self.cfg.num_classes,
            dropout_rate=self.cfg.dropout_rate,
            compute_dtype=self.cfg.compute_dtype,
            max_blocks=max_blocks,
        )

    def _get_trainer(self, spec: BucketSpec, pop: int):
        """Jitted PopulationTrainer per (bucket, pop). pop is part of the key
        only to keep one jit cache entry per program shape; the underlying
        builder is shape-polymorphic."""
        cache_key = (spec, pop)
        if cache_key not in self._compiled:
            t = make_population_trainer(spec, self.settings, self.cfg.num_classes)
            self._compiled[cache_key] = dataclasses.replace(
                t,
                train=jax.jit(t.train),
                run_full=jax.jit(t.run_full),
                run_chunk=jax.jit(t.run_chunk),
                finalize=jax.jit(t.finalize),
            )
        return self._compiled[cache_key]

    def _get_sharded_run_full(self, spec: BucketSpec, pop: int):
        """Fused bucket program shard_map'd over the mesh's 'pop' axis.

        Each device group receives its population shard (flags only — params
        are initialized INSIDE the program from the genome uids) plus the
        replicated dataset, and runs the full grouped-conv (or vmap) training
        loop locally: zero collectives on the training path, and still ONE
        launch per bucket. This is how the grouped-conv single-chip MXU
        strategy (models/grouped.py) composes with population
        data-parallelism (SURVEY.md §2.3) — GSPMD alone cannot shard it
        because grouped-conv merges the pop axis into conv channels.
        Requires mesh data axis == 1 (a sharded batch would need hand-rolled
        BN-stat/grad psums inside the shard)."""
        from jax.sharding import PartitionSpec as P

        cache_key = (spec, pop, "shard_map")
        if cache_key not in self._compiled:
            t = make_population_trainer(spec, self.settings, self.cfg.num_classes)
            fn = jax.shard_map(
                t.run_full,
                mesh=self.mesh,
                in_specs=(
                    P("pop"),  # flags: per-lane genome identity
                    P(), P(), P(),  # train set (replicated)
                    P(), P(), P(),  # val set (replicated)
                    P(), P(),  # base/train keys
                    P(),  # dynamic epoch cap
                ),
                out_specs=P("pop"),
                # per-lane early stopping exits each shard's while_loop when
                # ITS lanes are done; stopped lanes freeze, so per-genome
                # results are invariant to the other shards' schedules
                check_vma=False,
            )
            self._compiled[cache_key] = jax.jit(fn)
        return self._compiled[cache_key]

    # -- evaluation -----------------------------------------------------------

    def evaluate(self, genomes: Sequence[Genome], seed: int = 0) -> List[Fitness]:
        """Evaluate all genomes; returns fitness per genome in input order.
        Genomes sharing a bucket train together in one program launch."""
        t0 = time.perf_counter()
        self._launch_count = 0
        for g in genomes:
            validate(g)  # out-of-space genomes would silently mis-bucket
        results: List[Optional[Fitness]] = [None] * len(genomes)
        # replay finished trainings from the durable cache (crash-resume);
        # idempotence makes the replay behaviorally invisible
        cached: set = set()
        if self.fitness_cache is not None:
            for i, g in enumerate(genomes):
                hit = self.fitness_cache.get(g, seed)
                if hit is not None:
                    results[i] = hit
                    cached.add(i)

        bucket_genes = self.cfg.bucket_genes
        buckets: Dict[tuple, List[int]] = {}
        for i, g in enumerate(genomes):
            if i in cached:
                continue
            key = tuple(g[b] for b in bucket_genes)
            buckets.setdefault(key, []).append(i)
        # Two-pass async dispatch: every bucket's FUSED program (population
        # init + train while_loop + final metrics in one launch,
        # trainer.run_full) is dispatched before any result is materialized,
        # so the per-launch dispatch latency (~0.2 s through a remote-TPU
        # tunnel) overlaps across buckets instead of summing — and each
        # one-shot bucket is exactly ONE launch.
        # Caveat: the compaction path (effective chunk > 0) must materialize
        # per-chunk stop masks inline, so those buckets synchronize inside
        # the first pass — compaction trades dispatch overlap for dropped
        # lanes, which only pays off for big buckets / long budgets (PERF.md).
        # Compacted launches therefore go LAST, after every one-shot bucket's
        # programs are already in flight.
        launches = []
        for bkey, idxs in buckets.items():
            f, k = int(bkey[0]), int(bkey[1])
            sub = [genomes[i] for i in idxs]
            pop = min(
                _next_pow2(len(sub)), max(self.cfg.max_models_per_program, 1)
            )
            if pop > 1 and self._should_split_lanes(f, k, sub):
                # heavy lanes: per-genome launches (exactly the serial
                # baseline's work, async-dispatched) beat lockstep fusion
                pop = 1
            if len(sub) > pop and self.cfg.pack_by_stop_epoch:
                # stop-epoch packing (TrainConfig.pack_by_stop_epoch): group
                # similar-stop genomes into the same launch so the fast
                # launch exits early instead of every launch billing a
                # straggler's epochs. Uses the last observed epochs_ran per
                # genome (recorded below); unknown genomes sort last, input
                # order breaks ties.
                order = sorted(
                    range(len(sub)),
                    key=lambda j: (
                        self._epoch_history.get(
                            genome_key(sub[j]), float("inf")
                        ),
                        j,
                    ),
                )
                idxs = [idxs[j] for j in order]
                sub = [sub[j] for j in order]
            # chunk oversized sub-populations
            for start in range(0, len(sub), pop):
                chunk_idx = idxs[start : start + pop]
                chunk = sub[start : start + pop]
                target = _next_pow2(max(len(chunk), 1))
                if self.mesh is not None:
                    # lanes shard over 'pop': pad to a device-count multiple
                    npop = int(self.mesh.shape["pop"])
                    target = -(-target // npop) * npop
                padded = list(chunk) + [chunk[0]] * (target - len(chunk))
                # specialize the program to the deepest genome actually in
                # this launch: a shallow launch skips the unused residual
                # blocks instead of masking them (models/supernet.py). Per-
                # genome results are invariant to the specialization level
                # (prefix-stable init streams + exact-zero masked paths) —
                # bitwise on CPU; on TPU a different specialization level
                # compiles a different program whose matmul tiling rounds
                # differently (any precision), drifting fitness by ~1 val
                # sample via early-stop amplification (PERF.md round 4).
                # Lane order and launch membership at a FIXED level stay
                # bitwise on TPU too.
                spec = self._bucket_spec(
                    f, k, max(int(g["residual_blocks"]) for g in chunk)
                )
                launches.append((chunk_idx, spec, padded))
        launches.sort(
            key=lambda t: self._effective_chunk(len(t[2]), t[1]) > 0
        )
        # CMOOP_SYNC_DISPATCH=1 materializes each launch before dispatching
        # the next — a stability fallback for remote-TPU tunnels where many
        # concurrently in-flight programs at large feature shapes can crash
        # the worker (observed at BirdCLEF 501x40; KWS 44x13 never trips it).
        # Costs the dispatch overlap; results are bitwise identical.
        sync = os.environ.get("CMOOP_SYNC_DISPATCH", "0") == "1"
        # Bounded dispatch window: cap how many programs are in flight at
        # once. An unbounded flood of heavy programs wedges the remote
        # worker outright (round 4: 15 in-flight single-lane 501x40
        # programs futex-hung the process before its first result, while 8
        # fused in-flight programs at the same shape survived). The device
        # executes launches serially, so overlap only needs the queue
        # non-empty — a window of 4 keeps the pipeline full with worker
        # headroom. Materialization order equals launch order either way,
        # so results are identical to the unbounded pass. Default: bounded
        # only when the plan contains heavy launches; CMOOP_MAX_INFLIGHT
        # overrides (0 = unbounded).
        inflight_env = os.environ.get("CMOOP_MAX_INFLIGHT", "")
        if inflight_env:
            max_inflight = int(inflight_env)
        else:
            heavy_plan = any(
                self._est_epoch_seconds(len(padded), spec)
                * self.settings.epochs
                >= self._MIN_SPLIT_PROGRAM_SECONDS
                for _, spec, padded in launches
            )
            max_inflight = 4 if heavy_plan else 0  # 0 = unbounded
        # CMOOP_LOG_LAUNCHES=1 prints every launch (spec + lanes) to stderr
        # before dispatch and after materialization — the tool for isolating
        # which program a remote worker died in.
        log_launches = os.environ.get("CMOOP_LOG_LAUNCHES", "0") == "1"
        chunk_records = []

        def _materialize(chunk_idx, spec, fits):
            """Block on a launch's results, publish them, and make them
            durable — called inline per launch under sync dispatch (so a
            worker crash at launch N loses nothing from launches < N), and
            in the overlap pass otherwise (durable per bucket)."""
            fits = jax.tree.map(np.asarray, self._gather_replicated(fits))
            for j, gi in enumerate(chunk_idx):
                g = genomes[gi]
                acc, fpr = fits["acc"][j], fits["fpr"][j]
                size = model_size_mb(g, self.cfg.num_classes, self.cfg.template)
                results[gi] = (float(acc), float(size), float(fpr))
                self._epoch_history[genome_key(g)] = float(fits["epochs"][j])
            if self.fitness_cache is not None:
                self.fitness_cache.put_many(
                    [(genomes[gi], seed, results[gi]) for gi in chunk_idx]
                )
            pop = int(np.shape(fits["acc"])[0])
            # the record mirrors the LAUNCHED program exactly: specialized
            # depth from its spec, compaction from the effective policy
            chunk_records.append({
                "filters": spec.filters,
                "kernel": spec.kernel,
                "max_blocks": spec.max_blocks,
                "pop": pop,
                "compacted": self._effective_chunk(pop, spec) > 0,
                "epochs": [int(e) for e in fits["epochs"]],
            })

        pending = []
        for n, (chunk_idx, spec, padded) in enumerate(launches):
            if log_launches:
                print(
                    f"[launch {n+1}/{len(launches)}] f={spec.filters} "
                    f"k={spec.kernel} blocks={spec.max_blocks} "
                    f"pop={len(padded)} dispatch t+{time.perf_counter()-t0:.1f}s",
                    file=sys.stderr, flush=True,
                )
            fits = self._run_bucket(spec, padded, seed)
            if sync:
                _materialize(chunk_idx, spec, fits)
                if log_launches:
                    print(
                        f"[launch {n+1}/{len(launches)}] materialized "
                        f"t+{time.perf_counter()-t0:.1f}s",
                        file=sys.stderr, flush=True,
                    )
            else:
                pending.append((chunk_idx, spec, fits))
                if max_inflight and len(pending) >= max_inflight:
                    # retire the oldest launch before dispatching the next:
                    # keeps at most max_inflight programs outstanding
                    _materialize(*pending.pop(0))
        for chunk_idx, spec, fits in pending:
            _materialize(chunk_idx, spec, fits)  # blocks; rest in flight
        self.timings.append(
            {
                "n_genomes": len(genomes),
                "n_buckets": len(buckets),
                # major device-program dispatches (fused one-shot bucket = 1)
                "launches": self._launch_count,
                "seconds": time.perf_counter() - t0,
                "cache_hits": len(cached),
                # per-chunk execution shape for FLOPs/MFU accounting:
                # lockstep bills every (padded) lane until the slowest stops
                "chunks": chunk_records,
            }
        )
        # trainings actually performed (cache replays are not true evals)
        self._eval_count += len(genomes) - len(cached)
        return results  # type: ignore[return-value]

    # Conservative sustained device rate for launch-duration estimates
    # (measured ~35-40 TFLOP/s on BirdCLEF-sized training programs, ~25-32
    # on the KWS bench; underestimating the rate only chunks earlier).
    _SUSTAINED_FLOPS_PER_S = 20e12

    def _est_epoch_seconds(self, pop: int, spec: BucketSpec) -> float:
        """FLOPs-based estimate of one lockstep epoch's device seconds for a
        `pop`-lane launch of `spec` (executed work = the spec's MAX config,
        same accounting as bench.py's MFU)."""
        from ..models.genome_arch import count_fwd_flops

        gmax = {
            "filters": spec.filters, "kernel_size": spec.kernel,
            "use_bn": True, "residual_blocks": spec.max_blocks,
            "fc_layers": 4, "use_dropout": False,
        }
        hw = tuple(int(d) for d in self._train[0].shape[1:3])
        fwd = count_fwd_flops(gmax, hw, self.cfg.num_classes,
                              self.cfg.template)
        n_train_pad = int(self._train[0].shape[0])
        n_val_pad = int(self._val[0].shape[0])
        return (
            pop * fwd * (3 * n_train_pad + n_val_pad)
            / self._SUSTAINED_FLOPS_PER_S
        )

    # Heavy-bucket lane SPLIT threshold: under the adaptive policy a
    # multi-lane bucket is split into per-genome single-lane fused launches
    # when one lane's whole training run is estimated to cost at least this
    # many device seconds. Rationale (measured round 4 at the BirdCLEF
    # 501x40 shape, PERF.md): lockstep fusion bills every lane until the
    # bucket's slowest model stops — ~39% wasted executed FLOPs vs the
    # serial per-genome baseline at that shape — while the grouped-conv
    # rate at 2 lanes equals the single-lane rate (13.5 vs 13.6 TFLOP/s),
    # so fusing buys nothing there. Per-genome launches do exactly the
    # serial baseline's work and keep the two-pass async dispatch overlap,
    # so the extra per-launch latency (~0.2 s through the tunnel) hides
    # behind device execution once a single lane's program runs for >= 2 s.
    # KWS-sized lanes (~25 ms per whole training run) stay far below the
    # threshold: fusion remains the dispatch-amortizing win there.
    _MIN_SPLIT_PROGRAM_SECONDS = 2.0

    def _should_split_lanes(self, f: int, k: int, sub: List[Genome]) -> bool:
        """Adaptive-policy choice between fusing a bucket's lanes into one
        grouped launch (cheap lanes: dispatch overhead dominates) and
        splitting it into per-genome single-lane launches (heavy lanes:
        lockstep waste dominates, and each launch then also specializes to
        its own genome's exact depth). Only under compaction_chunk=-1 and
        never on a mesh (the pop axis is the sharded dimension there)."""
        if self.mesh is not None or self.settings.compaction_chunk >= 0:
            return False
        spec = self._bucket_spec(
            f, k, max(int(g["residual_blocks"]) for g in sub)
        )
        return (
            self._est_epoch_seconds(1, spec) * self.settings.epochs
            >= self._MIN_SPLIT_PROGRAM_SECONDS
        )

    def _effective_chunk(self, pop: int, spec: BucketSpec) -> int:
        """Resolve TrainConfig.compaction_chunk for a bucket of `pop` padded
        lanes. -1 = adaptive policy from the PERF.md measurements, two
        independent terms (smallest wins when both engage):

        * lane compaction — pays only when enough lanes can actually be
          dropped (pop >= 8) and the epoch budget dwarfs the chunk quantum;
          2*patience between compactions lets stopping decisions stabilize;
          (heavy-lane buckets never get here: _should_split_lanes turns
          them into single-lane launches before bucketing)
        * launch-duration bound — a one-shot launch whose estimated device
          time exceeds ``launch_seconds_budget`` runs in bounded chunks
          instead (remote workers kill device programs running longer than
          ~1-2 min; results are exactly one-shot-equal by the pinned
          compaction invariant).

        A device mesh forces one-shot regardless (compaction would fight the
        pop-axis sharding). An explicit non-negative compaction_chunk is
        honored verbatim (including 0 = always one-shot, which also disables
        the duration bound)."""
        if self.mesh is not None:
            return 0
        chunk = self.settings.compaction_chunk
        if chunk >= 0:
            return chunk
        lane_chunk = 0
        if (
            pop >= 8
            and self.settings.epochs >= 8 * max(self.settings.patience, 1)
        ):
            lane_chunk = max(2 * self.settings.patience, 10)
        dur_chunk = 0
        budget = self.settings.launch_seconds_budget
        if budget and budget > 0:
            est = self._est_epoch_seconds(pop, spec)
            if est * self.settings.epochs > budget:
                dur_chunk = max(int(budget / est), 1)
        if lane_chunk and dur_chunk:
            return min(lane_chunk, dur_chunk)
        return lane_chunk or dur_chunk

    def _init_bucket_population(
        self, spec: BucketSpec, padded: List[Genome], seed: int
    ):
        """Genome-keyed population init + the run's train stream key.

        Per-genome init keys are derived from (seed, genome identity), NOT
        from evaluation order: a genome's model instance is reproducible
        regardless of how the population is bucketed/batched, so population
        and serial execution train identical models (and re-evaluations are
        idempotent, matching the surrogate archive's keep-last dedup)."""
        init_keys = jnp.stack([
            jax.random.fold_in(
                jax.random.key(seed), zlib.crc32(str(genome_key(g)).encode())
            )
            for g in padded
        ])
        # whole-population init is ONE device launch; flag arrays are cheap
        # host numpy
        from ..models.supernet import init_population_device, stack_flags

        flags = stack_flags(padded)
        params, state = init_population_device(
            init_keys, flags["n_blocks"], flags["fc_entry"], spec
        )
        if self.mesh is not None:
            params, state, flags = self._shard_population(params, state, flags)
        # shuffle/dropout stream depends only on the run seed, keeping
        # re-evaluations idempotent (shared across a bucket's lanes; Keras
        # is unseeded here, so any fixed stream is distributionally faithful)
        train_key = jax.random.fold_in(jax.random.key(seed), 1)
        return params, state, flags, train_key

    def _run_single_with_params(self, spec: BucketSpec, genome: Genome,
                                seed: int):
        """One-genome one-shot training that RETURNS the trained carry —
        the normal evaluation paths deliberately discard parameters. Same
        init/shuffle/dropout streams as evaluate(), so the exported model
        reproduces the search-reported fitness (engine/export.py)."""
        params, state, flags, train_key = self._init_bucket_population(
            spec, [genome], seed
        )
        xtr, ytr, wtr = self._train
        xval, yval, wval = self._val
        trainer = self._get_trainer(spec, 1)
        carry = trainer.init_carry(params, state, flags)
        carry = trainer.run_chunk(
            carry, xtr, ytr, wtr, xval, yval, wval, train_key,
            jnp.asarray(self.settings.epochs, jnp.int32),
        )
        out = trainer.finalize(carry, xval, yval, wval)
        return out, carry

    def _run_bucket(self, spec: BucketSpec, padded: List[Genome], seed: int):
        from ..models.supernet import stack_flags

        pop = len(padded)
        # genome-identity flags + the run's base/train keys; per-genome init
        # keys are folded from flags['uid'] INSIDE the fused program
        # (models/supernet.init_population_in_program), matching
        # _init_bucket_population's host-side folding bit for bit
        flags = stack_flags(padded)
        base_key = jax.random.key(seed)
        train_key = jax.random.fold_in(base_key, 1)
        xtr, ytr, wtr = self._train
        xval, yval, wval = self._val
        acc_key = "acc_eval" if self.cfg.accuracy_from == "best" else "acc_last"

        chunk = self._effective_chunk(pop, spec)
        if chunk <= 0:
            # One-shot (a mesh also forces this — see _effective_chunk).
            # The epoch cap is passed as a call-site ARGUMENT so one compiled
            # program serves every epoch budget (a cap created inside the
            # traced function would bake in as a literal).
            if self.mesh is None:
                # the whole bucket is ONE fused launch: population init +
                # epoch while_loop + final metrics (trainer.run_full) — the
                # dominant cost of a warm-cache generation is per-launch
                # dispatch latency, not compute (PERF.md)
                trainer = self._get_trainer(spec, pop)
                out = trainer.run_full(
                    flags, xtr, ytr, wtr, xval, yval, wval,
                    base_key, train_key,
                    jnp.asarray(self.settings.epochs, jnp.int32),
                )
                self._launch_count += 1
            elif int(self.mesh.shape["data"]) == 1:
                # mesh, data axis 1: the same fused program, shard_map'd so
                # each device group trains its population shard with the
                # grouped-conv (or vmap) forward — still one launch
                if self._multiproc:
                    # host values -> global operands: flags as numpy (jit
                    # device_puts them to the 'pop' sharding, each process
                    # contributing its shards), keys rebuilt as replicated
                    # global key arrays
                    flags = jax.tree.map(np.asarray, flags)
                    base_key = self._replicate_key(base_key)
                    train_key = self._replicate_key(train_key)
                out = self._get_sharded_run_full(spec, pop)(
                    flags, xtr, ytr, wtr, xval, yval, wval,
                    base_key, train_key,
                    jnp.asarray(self.settings.epochs, jnp.int32)
                    if not self._multiproc
                    else np.asarray(self.settings.epochs, np.int32),
                )
                self._launch_count += 1
            else:
                # mesh with a sharded batch (data axis > 1): vmap lanes under
                # GSPMD, which inserts the BN-stat/grad psums automatically;
                # params are initialized and explicitly sharded over 'pop'
                # first (_init_bucket_population), then the chain runs
                trainer = self._get_trainer(spec, pop)
                params, state, flags, train_key = (
                    self._init_bucket_population(spec, padded, seed)
                )
                carry = trainer.init_carry(params, state, flags)
                carry = trainer.run_chunk(
                    carry, xtr, ytr, wtr, xval, yval, wval, train_key,
                    jnp.asarray(self.settings.epochs, jnp.int32),
                )
                out = trainer.finalize(carry, xval, yval, wval)
                self._launch_count += 4  # init_pop + carry + chunk + final
            # device arrays on purpose: evaluate() materializes AFTER every
            # bucket's programs are dispatched (async launch overlap)
            return {
                "acc": out[acc_key],
                "fpr": out["fpr"],
                "epochs": out["epochs_ran"],
            }

        # Chunked execution with lane compaction: between chunks, lanes whose
        # models early-stopped are finalized and dropped, and the survivors
        # continue in a half-or-smaller program — the lockstep while_loop
        # otherwise bills every lane for the SLOWEST model's epochs.
        # (Never fused: compaction must materialize stop masks between
        # chunks, so it keeps the explicit init/run/finalize chain. Only
        # reachable with mesh=None — _effective_chunk forces one-shot on a
        # mesh.)
        params, state, flags, train_key = self._init_bucket_population(
            spec, padded, seed
        )
        trainer = self._get_trainer(spec, pop)
        carry = trainer.init_carry(params, state, flags)
        self._launch_count += 2  # init_pop + init_carry
        lane_map = list(range(pop))  # current lane -> original padded index
        acc = np.zeros(pop)
        fpr = np.zeros(pop)
        epochs = np.zeros(pop, np.int32)

        def record(out, lanes):
            for li in lanes:
                oi = lane_map[li]
                if oi < 0:  # compaction padding lane
                    continue
                acc[oi] = out[acc_key][li]
                fpr[oi] = out["fpr"][li]
                epochs[oi] = out["epochs_ran"][li]

        while True:
            epoch = int(carry["epoch"])
            target_epoch = min(epoch + chunk, self.settings.epochs)
            carry = trainer.run_chunk(
                carry, xtr, ytr, wtr, xval, yval, wval, train_key,
                jnp.asarray(target_epoch, jnp.int32),
            )
            self._launch_count += 1
            stopped = np.asarray(carry["stopped"])
            done = bool(stopped.all()) or int(carry["epoch"]) >= self.settings.epochs
            cur_pop = len(lane_map)
            active = np.nonzero(~stopped)[0]
            target_pop = _next_pow2(max(len(active), 1))
            if done:
                self._launch_count += 1
                out = jax.tree.map(
                    np.asarray, trainer.finalize(carry, xval, yval, wval)
                )
                record(out, range(cur_pop))
                break
            if target_pop <= cur_pop // 2:
                self._launch_count += 1
                out = jax.tree.map(
                    np.asarray, trainer.finalize(carry, xval, yval, wval)
                )
                record(out, np.nonzero(stopped)[0])
                keep = list(active) + [int(active[0])] * (target_pop - len(active))
                carry = gather_lanes(carry, np.asarray(keep))
                lane_map = [lane_map[i] for i in active] + [-1] * (
                    target_pop - len(active)
                )
                trainer = self._get_trainer(spec, target_pop)

        # padding lanes introduced by compaction map to -1; their slots in
        # acc/fpr were never written for an original index, by construction
        return {"acc": acc, "fpr": fpr, "epochs": epochs}

    def _replicate_key(self, key):
        """Rebuild a host-local PRNG key as a mesh-replicated global key
        array (multi-host only). Every process derives the identical key
        from the run seed, so device_put of the raw key data against the
        replicated sharding is sound; wrap_key_data runs under jit so the
        typed-key construction itself executes on the global array."""
        from ..parallel.mesh import replicated

        rep = replicated(self.mesh)
        data = jax.device_put(np.asarray(jax.random.key_data(key)), rep)
        return jax.jit(jax.random.wrap_key_data, out_shardings=rep)(data)

    def _gather_replicated(self, tree):
        """Make launch results host-readable on every process: under a
        multi-host mesh the 'pop'-sharded outputs are not addressable
        beyond the local shards, so an identity jit with replicated
        out_shardings all-gathers them (no-op single-process)."""
        if not self._multiproc:
            return tree
        from ..parallel.mesh import replicated

        rep = replicated(self.mesh)
        leaves = [x for x in jax.tree.leaves(tree)
                  if isinstance(x, jax.Array) and not x.is_fully_addressable]
        if not leaves:
            return tree
        return jax.jit(lambda t: t, out_shardings=rep)(tree)

    def _shard_population(self, params, state, flags):
        """Shard the population axis over the mesh's 'pop' axis; data stays
        replicated (SURVEY.md §2.3: population data-parallelism over ICI)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        def shard_leaf(x):
            spec = P(*(("pop",) + (None,) * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        params = jax.tree.map(shard_leaf, params)
        state = jax.tree.map(shard_leaf, state)
        flags = jax.tree.map(shard_leaf, flags)
        return params, state, flags

    @property
    def total_true_evals(self) -> int:
        return self._eval_count


class FakeEvaluator:
    """Deterministic closed-form fitness over the 288-genome space.

    acc/fpr are smooth functions of the genome (bigger nets & BN help
    accuracy; more blocks & BN reduce FPR), size is the real analytic size,
    so constraint structure mirrors the real problem and the exact Pareto set
    is computable by enumeration. Optional noise mimics retraining variance
    while honoring the REAL engine's idempotence contract (a fitness is a
    pure function of (genome, seed, dataset) — the invariant the fitness
    cache and common-random-numbers comparisons rest on): the draw is keyed
    by (genome, eval seed, instance seed), so re-evaluating with the same
    seed repeats it and a different eval seed gives a fresh draw."""

    def __init__(
        self,
        num_classes: int = 10,
        template: str = "A",
        noise: float = 0.0,
        seed: int = 0,
    ):
        self.num_classes = num_classes
        self.template = template
        self.noise = noise
        self.seed = int(seed)
        self.total_true_evals = 0
        self.timings: List[Dict] = []

    def fitness(self, g: Genome) -> Fitness:
        from ..core.genome import HPARAM_SPACE

        f_idx = HPARAM_SPACE["filters"].index(g["filters"])
        acc = (
            0.80
            + 0.02 * f_idx
            + 0.02 * g["residual_blocks"]
            + 0.008 * g["fc_layers"]
            + (0.012 if g["use_bn"] else 0.0)
            - (0.004 if g["use_dropout"] else 0.0)
            + (0.002 if g["kernel_size"] == 5 else 0.0)
        )
        size = model_size_mb(g, self.num_classes, self.template)
        fpr = (
            0.14
            - 0.035 * g["residual_blocks"]
            - (0.015 if g["use_bn"] else 0.0)
            - 0.01 * f_idx
            + (0.003 if g["kernel_size"] == 5 else 0.0)
        )
        return min(acc, 0.995), size, max(fpr, 0.002)

    def evaluate(self, genomes: Sequence[Genome], seed: int = 0) -> List[Fitness]:
        from ..core.genome import genome_key

        out = []
        for g in genomes:
            acc, size, fpr = self.fitness(g)
            if self.noise:
                rng = np.random.default_rng(
                    [int(v) for v in genome_key(g)] + [int(seed), self.seed]
                )
                acc = float(np.clip(acc + rng.normal(0, self.noise), 0, 1))
                fpr = float(max(fpr + rng.normal(0, self.noise / 2), 0.0))
            out.append((acc, size, fpr))
        self.total_true_evals += len(genomes)
        return out
