"""Distributed KG-construction pipeline stages (transcripts → triples).

Stage order (SURVEY.md §7): extract → link → canonicalize → materialize.
Each stage is a pure DataFrame→DataFrame function; materialize adds
per-partition lineage + counters for exact resume.
"""
