"""Vectorized ``map_batches`` stages (extraction, dedup, similarity,
text stats, multimodal).  Every stage is a callable class usable as a
Ray Data actor-pool stage: setup in ``__init__``, batch work in
``__call__``; Arrow in / Arrow out wherever possible."""
