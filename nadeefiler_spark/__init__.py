"""nadeefiler_spark — a from-scratch PySpark-native profiling + constraint
validation engine with the capabilities of daqcri/nadeefiler.

The reference (read-only at /root/reference) is a Node/Mongo/AMQP data
profiler: CSV -> schemaless tuple store -> queue-dispatched pluggable
profilers -> schemaless results store -> dashboard. This package
re-expresses those semantics Spark-first:

- per-partition single-pass profiling compiled to ONE ``agg()``
  (reference: one Mongo ``$group`` pipeline per column,
  ``profilers/messystreams.js:100-106``),
- pluggable :class:`~nadeefiler_spark.rules.base.Rule` objects instead of
  queue-dispatched profiler processes (``profilers/worker.js:197-222``),
- an append-only, partition-overwritable violations/profile/verdict table
  set instead of a Mongo results collection
  (``profilers/worker.js:68-100``),
- a checkpoint manifest giving idempotent, resumable per-partition runs
  (reference: delete-before-write, ``profilers/worker.js:97-100``),
- vectorized pandas/Arrow UDFs for audio-aware rules (reference shells
  out to child processes for non-JS profilers,
  ``profilers/messytables/index.js:27-30``).

Primary input shape (BASELINE.json input_hint): an Iceberg-style table of
audio clip + transcript pairs ``(clip_id string, bytes binary, sr_hz int,
dur_ms int, codec string, transcript string)``. The engine is
schema-driven and generic — it profiles any DataFrame — the audio rules
are one plug-in family.
"""

__version__ = "0.1.0"
