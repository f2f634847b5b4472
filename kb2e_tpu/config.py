"""Run configuration.

``EmbeddingConfig`` mirrors the reference's 12-field ``EmbeddingArguments``
(``common/args.h:9-28``, defaults at ``common/args.cpp:19-31``) and adds the
TPU-native knobs (batch size policy, dtype, mesh shape, parity mode) that have
no counterpart in the single-threaded reference.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

from kb2e_tpu import constants as C


@dataclasses.dataclass
class EmbeddingConfig:
    # --- reference-parity fields (common/args.h:9-25) ---
    data_dir: str = C.DEFAULT_DATA_DIR
    output_dir: str = C.DEFAULT_OUTPUT_DIR
    embedding_size: int = C.DEFAULT_EMBEDDING_SIZE
    learning_rate: float = C.DEFAULT_LEARNING_RATE
    margin: float = C.DEFAULT_MARGIN
    method: C.Method = C.DEFAULT_METHOD
    num_batches: int = C.DEFAULT_NUM_BATCHES
    max_epochs: int = C.DEFAULT_MAX_EPOCHS
    distance: C.Distance = C.DEFAULT_DISTANCE
    seed_data_dir: str = C.DEFAULT_SEED_DATA_DIR
    seed_method: C.Method = C.DEFAULT_SEED_METHOD
    # Reference defaults the seed to time(NULL) (common/args.cpp:30) — runs are
    # only reproducible when --seed is given; we keep that behaviour.
    seed: Optional[int] = None

    # --- TPU-native extensions (no reference counterpart) ---
    # Number of corruption candidates drawn per sample, replacing the
    # reference's unbounded rejection loop (common/trainer.cpp:88-98): the
    # first certified negative wins; miss probability is (deg/N)^rounds
    # (~1e-16 on FB15k-scale graphs at 4) and misses are masked from the loss.
    corruption_resample_rounds: int = 4
    # Negatives drawn per positive (DGL-KE-style multi-negative training).
    # 1 = the reference's single corruption per sample; K>1 flattens each
    # batch into B·K (positive, negative) pairs — every violating pair
    # applies the reference's margin update, raising arithmetic intensity
    # per sampled positive.  Production knob; defaults to reference policy.
    num_negatives: int = 1
    # Embedding-table storage dtype: 'float32' (default) or 'bfloat16'.
    # Training is throughput-bound on random row transactions (PERF.md);
    # bf16 rows halve the bytes per access.  Update math still runs in
    # float32 (rows are upcast after gather, deltas cast back before the
    # scatter-add); quality impact measured in QUALITY.md.  TransE honours
    # it; TransH/TransR/PTransE keep float32 (orthogonality loops and the
    # path loss are precision-sensitive).
    param_dtype: str = "float32"
    # Entity-axis block size for the blockwise evaluation sweep.
    eval_block_size: int = 4096
    # Evaluation query batch (number of (triple, direction) queries scored
    # together against all entities).
    eval_batch_size: int = 256
    # Ranking sweep implementation: 'auto' (Pallas kernel on TPU, XLA
    # elsewhere), 'xla', or 'pallas'.
    eval_impl: str = "auto"
    # 'fast' = vectorized batch update (segment-sum + one projection);
    # 'parity' = sequential lax.scan replicating the reference's per-update
    # double-buffered semantics (transe/trainer.cpp:48-56) for allclose tests.
    update_mode: str = "fast"
    # Orthogonality / transR projection loop cap (reference loops unboundedly,
    # common/utils.cpp:85-108 and transr/trainer.cpp:36-63).
    projection_max_iters: int = 16
    # Row-update scatter lowering: 'direct' (duplicate-tolerant scatter-add)
    # or 'dedup' (sort + segment-sum, then unique-index scatter) — see
    # kb2e_tpu/ops/scatter.py.
    scatter_mode: str = "direct"
    # Parity-mode implementation: 'auto' (fused Pallas kernel on TPU for
    # TransE, lax.scan elsewhere), 'scan', or 'pallas'.
    parity_impl: str = "auto"
    # DIAGNOSTIC ONLY — comma-set of chunk-pipeline blocks to skip in the
    # TransR/CTransR fast path ('scatter', 'norms', 'ball'), used by
    # benchmarks/segment_probe.py to bisect the axon backend's runtime
    # kernel fault (PERF.md "Axon segment fault").  Ablated runs are NOT
    # semantically valid training.
    debug_ablate: str = ""
    # Optional mesh axis sizes for distributed runs; None = single device.
    data_axis: Optional[int] = None
    model_axis: Optional[int] = None

    # --- PTransE path-modelling knobs (models/ptranse.py; the reference fork
    # reports PTransE numbers in README.md:26-29 but ships no code) ---
    # Relation-path composition: 'add' | 'mul' | 'rnn' (paper §3.2).
    path_composition: str = "add"
    # Weight of the path loss term relative to the triple loss.
    path_weight: float = 1.0
    # Margin for the relation-corruption path loss.
    path_margin: float = 1.0
    # Paths kept per (h, t) pair (top-confidence).
    max_paths: int = 8
    # Maximum path length in hops (2 = "2-step", 3 = "3-step").
    path_length: int = 2
    # Minimum normalised PCRA reliability for a path to be kept.
    path_min_conf: float = 0.01
    # Skip expanding (node, relation) fan-outs above this cap (0 = no cap) —
    # the standard hub truncation during path extraction.
    path_max_branch: int = 0

    def resolved_seed(self) -> int:
        return int(time.time()) if self.seed is None else int(self.seed)

    @property
    def method_name(self) -> str:
        return C.Method.from_any(self.method).tag

    def replace(self, **kw) -> "EmbeddingConfig":
        return dataclasses.replace(self, **kw)

    def describe(self) -> str:
        """Human-readable echo, analogous to EmbeddingArguments::to_string
        (common/args.cpp:34-53)."""
        m = C.Method.from_any(self.method).tag
        sm = C.Method.from_any(self.seed_method).tag
        return (
            f"Options: [datadir: '{self.data_dir}', outdir: '{self.output_dir}', "
            f"size: {self.embedding_size}, rate: {self.learning_rate:.6f}, "
            f"margin: {self.margin:.6f}, method: {m}, "
            f"batches: {self.num_batches}, epochs: {self.max_epochs}, "
            f"distance: {int(self.distance)}, seeddatadir: '{self.seed_data_dir}', "
            f"seedmethod: {sm}, seed: {self.resolved_seed()}]"
        )
