"""Structured Streaming layer.

Maps the reference's streaming semantics (SURVEY §2.9):
- inputs -> readStream sources (fluent_bit_spark.streaming.sources;
  in_tail ≈ file stream with glob + checkpoint, in_dummy ≈ rate source)
- SP windows -> event-time F.window + watermark (default) or
  processing-time parity mode (fluent_bit_spark.streaming.windows)
- stateful operators (snapshot ring buffer, throttle, multiline
  reassembly) -> applyInPandasWithState
  (fluent_bit_spark.streaming.stateful)
- chunk/backpressure -> micro-batches + maxFilesPerTrigger/checkpoints
"""
