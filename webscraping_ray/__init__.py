"""webscraping_ray — a Ray-Data-native crawl + extraction engine.

A from-scratch reimplementation of the observable semantics of
``richardpenman/webscraping`` (reference at /root/reference, py2) as a
distributed engine built on ``ray.data.Dataset``:

- ``kernels/``   pure-Python/py3 kernels with reference-identical output
                 (text normalization, subset-XPath, URL canonicalization,
                 extractors).  No Ray imports here.
- ``state/``     stateful building blocks: cuckoo/bloom approximate
                 membership, sharded URL-seen actors, politeness clock.
- ``stages/``    vectorized ``map_batches`` stages (extraction, dedup,
                 similarity, text stats, multimodal stubs).
- ``sources/``   deterministic synthetic page-corpus generator + a
                 hash-partitioned corpus store ("the web" as Parquet).
- ``pipelines/`` the BFS wave-loop crawler and frontier semantics.
- ``oracle/``    a vendored single-threaded py3 port of the reference's
                 crawl semantics, used only as a test oracle.

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
