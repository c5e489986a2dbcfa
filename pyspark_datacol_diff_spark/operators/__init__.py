"""Operators: diff (core), dedup, similarity, text, multimodal.

Branch-point checkpoint contract (ADVICE r11, centralized note): many
operators pin a relation that feeds multiple plan references with a lazy
``localCheckpoint`` — Catalyst reuses no shared subtree across
references, so without it the upstream pipeline re-executes per
reference. Two consequences every caller of such an operator inherits:

- RETAINED BLOCKS: the checkpointed blocks stay live after the caller's
  action (there is no DataFrame-level handle to release them). Long-
  lived sessions must release them at quiescent points via
  ``session.free_persistent_rdds`` / ``quiesce_session`` (the bench,
  parity, and smoke harnesses all do).
- EXECUTOR LOSS: a local checkpoint truncates lineage; losing an
  executor that held its blocks makes the in-flight job unrecoverable
  (Spark re-raises rather than recomputing). That is the documented
  trade for bounded plan growth — on a cluster where executor churn is
  expected, prefer ``spark.sparkContext.setCheckpointDir`` + reliable
  ``checkpoint`` at the same branch points.
- CONSTRUCT-ACT COUPLING: do not ``quiesce_session`` between
  CONSTRUCTING a returned frame and ACTING on it — releasing the blocks
  out from under an unexecuted plan fails the read (see
  ``free_persistent_rdds``' danger note).
"""
