"""tsrollup — a Ray-Data-native time-series rollup + downsample + retention engine.

A from-scratch re-expression (NOT a port) of the capabilities of the reference
repo ehsan-honarbakhsh/Streaming-Downsampling (Kafka/Flink wavelet-transformer
streaming downsampler) as an idiomatic Ray Data batch-streaming DAG:

    ray.data.read_parquet  (Parquet of pre-tokenized sequences)
      -> map_batches  (validate, derive event time, scrub)        [stateless]
      -> map_batches  (salted partial rollup combine)             [stateless]
      -> groupby(source, bucket).aggregate(...)                   [the one wide step]
      -> shuffle.map_key_groups((tier, source, window), gap-fill) [rolled data, small]
      -> map_batches(WaveletStage, concurrency=...)               [actor pool]
      -> map_batches(GorillaStage)                                [encode]
      -> write_parquet(partitioned) + lineage manifest            [resumable commit]

Plus a library of training-data operators (dedup, ANN similarity search, text
analysis, multimodal plumbing) under ``tsrollup.functions``.

All kernels are pure NumPy / pyarrow.compute and deterministic (seeded); no
TensorFlow / PyWavelets / Kafka / Flink dependencies.
"""

from tsrollup.config import RollupConfig

__all__ = ["RollupConfig"]
__version__ = "0.1.0"
