"""Pipelines: the BFS wave-loop crawler, frontier/queue semantics, and
whole-corpus extraction runs."""
