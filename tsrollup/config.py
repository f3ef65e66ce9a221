"""Engine configuration.

The reference hard-codes its knobs per entry point (reference ``main.py:98-112``);
the engine exposes the same surface — wavelet family / level / mode, retention
rate, approx pooling factor (reference ``core/downsampling_algorithm2.py:245-257``)
— plus the Ray-native knobs (batch sizes, actor-pool concurrency, tier
retention) as one dataclass, loadable from YAML/CLI for ``ray job submit``.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field

# Deterministic event-time derivation: doc_id = f"{source}-{seq:010d}" encodes
# ts = EPOCH0_S + seq * STEP_S (seconds). 2026-01-01T00:00:00Z.
EPOCH0_S = 1_767_225_600
STEP_S = 1
SECONDS_PER_BUCKET = 60          # the 1m tier bucket width
TIER_FACTORS = {"1m": 1, "1h": 60, "1d": 1440}   # in 1m buckets


@dataclass(frozen=True)
class RollupConfig:
    # --- wavelet kernel (the reference's constants, reference main.py:98-112) ---
    wavelet: str = "db4"
    dwt_level: int = 1
    mode: str = "symmetric"
    retention_rate: float = 0.8        # detail top-k keep fraction
    approx_ds_factor: int = 2          # approx branch avg-pool factor
    window_len: int = 200              # buckets per downsampling window (ref L=200)
    min_wavelet_len: int = 16          # shorter windows pass through un-downsampled
    detail_selector: str = "topk"      # "topk" | "adaptive" (ref K7 variant)
    scorer: str = "abs"                # registered importance scorer (wavelet.SCORERS)
    target_cumulative_importance: float = 0.99   # adaptive-k cut (ref algo3:146-171)
    min_retention_rate: float = 0.1              # adaptive-k floor

    # --- gap-fill ---
    gapfill_method: str = "linear"     # "linear" | "ffill" | "zero"

    # --- ingest ---
    validate_tokens: bool = True       # scan tokens and enforce n_tok == len(tokens);
                                       # False prunes the tokens column at the read

    # --- tiers & retention (max age in 1m buckets; None = keep forever) ---
    tiers: tuple[str, ...] = ("1m", "1h", "1d")
    retention_buckets: dict[str, int | None] = field(
        default_factory=lambda: {"1m": None, "1h": None, "1d": None}
    )

    # --- Ray execution knobs ---
    batch_size: int = 65536            # rows per map_batches call (ingest/partial)
    window_batch_size: int = 512       # window-rows per wavelet-stage batch
    wavelet_concurrency: int | None = None   # actor pool size; None = task pool
    # (a salt_buckets knob existed in round 1 but was never read — the
    #  partial-combine design makes per-key salting unnecessary; removed.)

    # --- paths ---
    out_root: str = "/tmp/tsrollup_out"

    def __post_init__(self) -> None:
        if self.dwt_level < 1:
            raise ValueError(f"dwt_level must be >= 1, got {self.dwt_level}")
        if self.mode not in ("symmetric", "periodization"):
            # dwt1 would silently fall back to symmetric — reject instead
            raise ValueError(f"unknown DWT mode {self.mode!r}")
        if self.gapfill_method not in ("linear", "ffill", "zero"):
            raise ValueError(f"unknown gapfill_method {self.gapfill_method!r}")
        if self.detail_selector not in ("topk", "adaptive"):
            raise ValueError(f"unknown detail_selector {self.detail_selector!r}")
        from tsrollup.wavelet import SCORERS, filter_bank

        filter_bank(self.wavelet)  # fail fast on unknown families (raises ValueError)
        if self.scorer not in SCORERS:
            # otherwise a typo dies later as a KeyError inside a Ray actor,
            # after the ingest/rollup work has already been spent
            raise ValueError(
                f"unknown scorer {self.scorer!r}; registered: {sorted(SCORERS)}"
            )

    def config_hash(self, tier: str | None = None) -> str:
        """Stable hash of the semantic knobs — stamped into lineage records.

        Per-tier when ``tier`` is given: excludes the tier *list* and other
        tiers' retention, so a run configured for ("1m",) and a later full run
        agree that the committed 1m tier is reusable (resume granularity).
        """
        d = asdict(self)
        # execution knobs don't change results; exclude them from the hash
        for k in ("batch_size", "window_batch_size", "wavelet_concurrency", "out_root"):
            d.pop(k, None)
        if tier is not None:
            d.pop("tiers", None)
            d["retention_buckets"] = {tier: self.retention_buckets.get(tier)}
        return hashlib.sha256(json.dumps(d, sort_keys=True).encode()).hexdigest()[:16]

    @classmethod
    def from_yaml(cls, path: str) -> "RollupConfig":
        """Load from a YAML file (the engine's S8 config surface — the
        reference's ``kafka_config.yaml`` equivalent). Unknown keys error;
        ``tiers`` may be a list; ``retention_buckets`` a mapping."""
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        known = set(cls.__dataclass_fields__)
        unknown = set(raw) - known
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        if "tiers" in raw:
            raw["tiers"] = tuple(raw["tiers"])
        return cls(**raw)
