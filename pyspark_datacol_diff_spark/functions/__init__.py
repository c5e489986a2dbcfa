"""Reusable Column-expression builders shared across operators.

One import point for the engine's scalar/array expression vocabulary —
every builder is a pure ``pyspark.sql.Column`` expression (JVM-side,
codegen'd, no UDFs), defined next to the operator family that owns it
and re-exported here:

- vector math: ``dot``, ``norm``, ``cosine``, ``int_dot``,
  ``quantize_scale``, ``quantize_int8`` (similarity)
- shingling / fingerprints: ``word_ngrams``, ``hamming64`` (dedup),
  ``doc_fingerprint``, ``rolling_hash_fingerprint`` (text)
- text stats: ``token_count``, ``bpe_ish_token_count``, ``char_count``,
  ``punct_count``, ``stopword_hits``, ``quality_score``, ``lang_id``,
  ``cjk_char_count``, ``max_equal_run`` (text)
- deterministic bucketing: ``hash_bucket`` (sampling)
- PII scrubbing: ``scrub_pii``, ``pii_counts`` (corpus)
"""

from __future__ import annotations

from ..operators.corpus import pii_counts, scrub_pii
from ..operators.dedup import hamming64, word_ngrams
from ..operators.sampling import hash_bucket
from ..operators.similarity import (
    cosine,
    dot,
    int_dot,
    norm,
    quantize_int8,
    quantize_scale,
    srp_planes,
)
from ..operators.text import (
    bpe_ish_token_count,
    char_count,
    cjk_char_count,
    doc_fingerprint,
    lang_id,
    punct_count,
    quality_score,
    max_equal_run,
    rolling_hash_fingerprint,
    stopword_hits,
    token_count,
)

__all__ = [
    "bpe_ish_token_count",
    "char_count",
    "cjk_char_count",
    "cosine",
    "doc_fingerprint",
    "dot",
    "hamming64",
    "hash_bucket",
    "int_dot",
    "lang_id",
    "max_equal_run",
    "norm",
    "pii_counts",
    "punct_count",
    "quality_score",
    "quantize_int8",
    "quantize_scale",
    "srp_planes",
    "scrub_pii",
    "rolling_hash_fingerprint",
    "stopword_hits",
    "token_count",
    "word_ngrams",
]
