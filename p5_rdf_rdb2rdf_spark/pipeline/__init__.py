"""Interleaved text+media document pipeline (BASELINE.json north_star):

corpus -> span explode -> mention detection -> triple extraction ->
entity linking -> connected-components canonicalization -> distinct-triple
materialization, with per-stage checkpoints + lineage.
"""
