"""Crawl state/metrics export (reference ``State``, download.py:873-945).

The reference checkpoints a JSON blob (num_downloads / num_errors /
queue_size / duration) every 10 s via atomic tmp+rename.  Here the
same counters — plus per-stage wall times and a per-host wave
histogram for skew detection (SURVEY §4) — accumulate per wave and
flush atomically to ``status.json``.
"""

from __future__ import annotations

import json
import os
import time


class CrawlState:
    """Accumulates per-wave crawl counters and stage timings."""

    def __init__(self, output_file: str | None = None):
        self.output_file = output_file
        self.start_time = time.time()
        self.num_downloads = 0     # successful fetches (status 200)
        self.num_errors = 0        # fetch misses
        self.num_caches = 0        # corpus rows touched
        self.queue_size = 0        # next-frontier size
        self.waves = []            # per-wave records

    def record_wave(self, wave: int, n_rows: int, n_ok: int, n_candidates: int,
                    n_new: int, queue_size: int, stage_secs: dict,
                    host_histogram: dict | None = None):
        self.num_downloads += n_ok
        self.num_errors += n_rows - n_ok
        self.num_caches += n_ok
        self.queue_size = queue_size
        top_hosts = {}
        if host_histogram:
            top_hosts = dict(sorted(host_histogram.items(),
                                    key=lambda kv: -kv[1])[:10])
        self.waves.append({
            'wave': wave,
            'rows': n_rows,
            'ok': n_ok,
            'candidates': n_candidates,
            'new_urls': n_new,
            'queue_size': queue_size,
            'stage_secs': {k: round(v, 4) for k, v in stage_secs.items()},
            'top_hosts': top_hosts,
        })
        if self.output_file:
            self.save()

    def snapshot(self) -> dict:
        return {
            'num_downloads': self.num_downloads,
            'num_errors': self.num_errors,
            'num_caches': self.num_caches,
            'queue_size': self.queue_size,
            'duration_secs': round(time.time() - self.start_time, 3),
            'waves': self.waves,
        }

    def save(self):
        """Atomic write (reference tmp+rename pattern, download.py:924-945)."""
        if not self.output_file:
            return
        d = os.path.dirname(self.output_file)
        if d:
            os.makedirs(d, exist_ok=True)
        tmp = self.output_file + '.tmp'
        with open(tmp, 'w') as f:
            json.dump(self.snapshot(), f, indent=1)
        os.replace(tmp, self.output_file)
