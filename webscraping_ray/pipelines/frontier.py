"""Durable frontier queue + deduped CSV sink.

- :class:`ParquetQueue` — the reference's disk priority queue
  (``pdict.Queue``, reference pdict.py:402-497: INSERT-OR-IGNORE push,
  claim-status pull ordered by priority desc, clear) re-expressed as
  Parquet segments + a claim manifest.  Designed so push/pull survive
  process death: state is (segments on disk) + (claimed-hash sets per
  pull), committed atomically.
- :func:`write_csv_unique` — ``common.UnicodeWriter`` with
  unique/unique_by semantics (reference common.py:535-649) as a
  Ray Data pipeline: dedup on the key columns (first wins by a stable
  order column) then ``write_csv``.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..kernels.urls import url_hash64


class ParquetQueue:
    """Durable priority queue of (key, priority) with exactly-once pull.

    Layout::

        root/seg_00000.parquet      (key, key_hash, priority, seq)
        root/claims.json            {"claimed": [key_hash...], "next_seq": N}

    push() ignores keys already present (INSERT OR IGNORE,
    pdict.py:463); pull(limit) claims the top-priority unclaimed keys
    (ORDER BY priority DESC + insertion seq for stable ties,
    pdict.py:472) and commits the claim atomically before returning —
    a crash between commit and processing loses at most the in-flight
    batch, mirroring the reference's claim-status semantics.
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._claims_path = os.path.join(root, 'claims.json')
        if os.path.exists(self._claims_path):
            with open(self._claims_path) as f:
                st = json.load(f)
            self._claimed = set(st['claimed'])
            self._next_seq = st['next_seq']
            self._next_seg = st['next_seg']
        else:
            self._claimed = set()
            self._next_seq = 0
            self._next_seg = 0
            self._commit_claims()

    # ------------------------------------------------------------------
    def _segments(self):
        return sorted(f for f in os.listdir(self.root)
                      if f.startswith('seg_') and f.endswith('.parquet'))

    def _read_all(self) -> pa.Table:
        segs = self._segments()
        if not segs:
            return pa.table({'key': pa.array([], pa.string()),
                             'key_hash': pa.array([], pa.int64()),
                             'priority': pa.array([], pa.int64()),
                             'seq': pa.array([], pa.int64())})
        return pa.concat_tables(
            pq.read_table(os.path.join(self.root, s)) for s in segs)

    def _commit_claims(self):
        tmp = self._claims_path + '.tmp'
        with open(tmp, 'w') as f:
            json.dump({'claimed': sorted(self._claimed),
                       'next_seq': self._next_seq,
                       'next_seg': self._next_seg}, f)
        os.replace(tmp, self._claims_path)

    # ------------------------------------------------------------------
    def push(self, key_map):
        """Add [(key, priority)]; existing keys are ignored
        (INSERT OR IGNORE, pdict.py:453-465)."""
        if not key_map:
            return
        existing = set(self._read_all().column('key_hash').to_pylist())
        keys, hashes, prios, seqs = [], [], [], []
        seen_batch = set()
        for key, prio in key_map:
            h = url_hash64(key)
            if h in existing or h in seen_batch:
                continue
            seen_batch.add(h)
            keys.append(key)
            hashes.append(h)
            prios.append(int(prio))
            seqs.append(self._next_seq)
            self._next_seq += 1
        if not keys:
            return
        seg = os.path.join(self.root, 'seg_%05d.parquet' % self._next_seg)
        self._next_seg += 1
        tmp = seg + '.tmp'
        pq.write_table(pa.table({
            'key': pa.array(keys, pa.string()),
            'key_hash': pa.array(hashes, pa.int64()),
            'priority': pa.array(prios, pa.int64()),
            'seq': pa.array(seqs, pa.int64()),
        }), tmp)
        os.replace(tmp, seg)
        self._commit_claims()

    def __len__(self):
        """Unclaimed count (SELECT count(*) WHERE status=0,
        pdict.py:446-450)."""
        tbl = self._read_all()
        hashes = tbl.column('key_hash').to_pylist()
        return sum(1 for h in hashes if h not in self._claimed)

    def pull(self, limit: int = 1000):
        """Claim up to ``limit`` top-priority keys (pdict.py:468-478).

        Order: priority DESC, then insertion seq (stable, deterministic
        — the reference's sqlite order for ties is rowid insertion).
        """
        tbl = self._read_all()
        rows = [r for r in tbl.to_pylist() if r['key_hash'] not in self._claimed]
        rows.sort(key=lambda r: (-r['priority'], r['seq']))
        take = rows[:limit]
        self._claimed.update(r['key_hash'] for r in take)
        self._commit_claims()
        return [r['key'] for r in take]

    def clear(self, keys=None) -> int:
        """Remove keys (or all); returns removed count (pdict.py:481-497)."""
        prev = len(self)
        if keys is None:
            for s in self._segments():
                os.remove(os.path.join(self.root, s))
            self._claimed = set()
            self._commit_claims()
            return prev
        drop = {url_hash64(k) for k in keys}
        self._claimed.update(drop)
        self._commit_claims()
        return prev - len(self)


def write_csv_unique(ds, out_dir: str, unique_by=None, order_col=None):
    """Deduped CSV sink (UnicodeWriter unique/unique_by semantics,
    reference common.py:564-589,621-630).

    unique_by: key column names (None = all columns); first row per key
    wins, "first" defined by ``order_col`` ascending (or input order of
    the min order value when given).  Returns the output directory.
    """
    import pandas as pd

    cols = ds.schema().names
    keys = list(unique_by) if unique_by else list(cols)

    def first_per_key(g: pd.DataFrame) -> pd.DataFrame:
        if order_col:
            g = g.sort_values(order_col)
        return g.head(1)

    deduped = ds.groupby(keys).map_groups(first_per_key, batch_format='pandas')
    deduped.write_csv(out_dir)
    return out_dir
