"""rayrl — a Ray-Data-native record-linkage benchmark engine.

Re-implements the capabilities of the reference R package
``pinformatics/rlErrorGeneratoR`` (error injection with a ground-truth
ledger + a full blocking / pairwise-scoring / clustering linkage
pipeline) as idiomatic Ray Data: ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages, and explicit partitioning for web scale.

Nothing in this package calls ``ray.init()`` — sessions are owned by the
caller (tests, bench.py, or the driver).
"""

__version__ = "0.1.0"
