"""Sources: Kafka / file / synthetic-generator inputs.

Mirrors the reference's source surface (SURVEY.md §2.1): the Kafka
JSON transaction stream (S1+S2), explicit no-watermark semantics
(S3), and the synthetic event generator (S4) — plus batch file
readers with explicit schemas for the testable core.
"""
