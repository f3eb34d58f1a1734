"""Large-scale training-data operators (extension surface beyond the
reference, SURVEY.md §7 Phase 3): deduplication, text analysis,
embedding similarity search, multimodal column plumbing.

Design rule: everything is a declarative DataFrame plan built from
JVM-side expressions (higher-order array functions, md5, regexp) —
no Python in the hot path except the explicitly-Arrow-batched
multimodal decode. Every deterministic operator has a DuckDB oracle
twin generated from the same constants (see registry.py), so the
driver can value-check them.
"""
