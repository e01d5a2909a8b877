"""The transcript → knowledge-graph pipeline.

Stages (BASELINE.json north rule):
``transcripts`` (synthetic deterministic input) → ``extract`` (mapping rules
→ triples + mentions) → ``linking`` (blocking keys → candidate pairs →
scored edges) → ``cc`` (connected components) → ``canonicalize`` →
``materialize`` (partitioned graph table), with ``checkpoint`` giving every
stage a resumable manifest.
"""
