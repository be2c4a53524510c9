"""Distributed connected components over a near-dup edge list.

Near-dup pair lists (``minhash_dup_pairs`` / ``simhash_dup_pairs`` /
``embedding_dup_pairs``) are edges of a similarity graph; corpus-level
dedup keeps ONE document per connected component (the RefinedWeb /
FineWeb convention), not one per pair — pairwise max-drop can delete a
whole chain a-b-c down to nothing reachable.  This module labels every
node with ``min(doc_id)`` of its component.

Algorithm (public): hash-to-min label propagation with pointer
jumping — Rastogi et al., "Finding Connected Components in Map-Reduce
in Logarithmic Rounds" (ICDE'13) / Kiveris et al., "Connected
Components in MapReduce and Beyond" (SoCC'14).  Labels start at the
node id, each round every node takes the min label over itself and its
neighbours, then jumps to its label's label; labels are monotone
nonincreasing, so a stable label sum certifies the fixpoint.

Tiered like the rest of the repo (stages/dedup.py): at or below
``DRIVER_EDGE_LIMIT`` edges a vectorized numpy fold runs on the driver
(the pair list is answer-sized for realistic dup rates); above it the
same iteration runs as Dataset joins — per-round state is two int64
columns over the nodes, never the corpus text.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: edge lists at or below this size fold on the driver (two int64
#: numpy columns; 4M edges = 64 MB peak).  Above it — a 100-TB corpus
#: with a high near-dup rate — the Dataset-join tier runs.
DRIVER_EDGE_LIMIT = 4_000_000

#: hard cap on propagation rounds.  Pointer jumping converges in
#: O(log(longest chain)); 64 rounds covers components of length 2^64.
MAX_ROUNDS = 64


def _cc_numpy(u: np.ndarray, v: np.ndarray) -> pa.Table:
    """Vectorized hash-to-min over index-compressed node ids."""
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    eu, ev = inv[:len(u)], inv[len(u):]
    lbl = np.arange(len(nodes), dtype=np.int64)
    for _ in range(MAX_ROUNDS):
        prev = lbl.copy()
        # min over neighbours (both directions; self is implicit
        # because minimum.at only ever lowers)
        np.minimum.at(lbl, eu, prev[ev])
        np.minimum.at(lbl, ev, prev[eu])
        lbl = lbl[lbl]  # pointer jump
        if np.array_equal(lbl, prev):
            break
    else:  # pragma: no cover - 2^64-long chains do not fit in RAM
        raise RuntimeError('connected components did not converge')
    order = np.argsort(nodes, kind='stable')
    return pa.table({'doc_id': pa.array(nodes[order], pa.int64()),
                     'cluster_id': pa.array(nodes[lbl][order],
                                            pa.int64())})


def _cc_dataset(edges, num_partitions: int = 8):
    """Dataset-join tier: per-round state is (node, lbl) int64 pairs.

    Each round is two hash joins and one Min aggregate over O(nodes)
    rows; the round count is O(log diameter) thanks to pointer
    jumping.  Labels are monotone nonincreasing with node ids >= 0, so
    an unchanged Sum(lbl) certifies the fixpoint without a
    change-count join.  (At >= 2^32 nodes the sum check needs a wider
    accumulator — swap for a changed-rows join count there.)
    """
    import ray.data  # noqa: F401  (Dataset API)
    from ray.data.aggregate import Min, Sum

    from .dedup import _join_safe

    def stack_directed(t: pa.Table) -> pa.Table:
        a = t.column('id_a').cast(pa.int64())
        b = t.column('id_b').cast(pa.int64())
        return pa.table({
            'u': pa.chunked_array(a.chunks + b.chunks),
            'v': pa.chunked_array(b.chunks + a.chunks)})

    ed = edges.map_batches(stack_directed,
                           batch_format='pyarrow').materialize()
    if ed.count() == 0:
        return pa.table({'doc_id': pa.array([], pa.int64()),
                         'cluster_id': pa.array([], pa.int64())})

    labels = _join_safe(
        ed.groupby('u').aggregate(Min('v', alias_name='_m'))
        .map_batches(lambda t: pa.table({'node': t['u'], 'lbl': t['u']}),
                     batch_format='pyarrow'),
        num_partitions).materialize()

    prev_sum = None
    for _ in range(MAX_ROUNDS):
        # neighbour messages: (v, lbl(u)) for every directed edge
        msgs = (ed.join(labels, 'inner', num_partitions=num_partitions,
                        on=('u',), right_on=('node',))
                .map_batches(lambda t: pa.table({'node': t['v'],
                                                 'cand': t['lbl']}),
                             batch_format='pyarrow'))
        # own label rides along as one more candidate — stacked inside
        # the aggregate input by a rename map, NOT Dataset.union (a
        # union feeding a groupby loses shards for some partitions in
        # Ray 2.49; see stages/dedup.py _join_safe)
        own = labels.map_batches(
            lambda t: pa.table({'node': t['node'], 'cand': t['lbl']}),
            batch_format='pyarrow')
        # two-source groupby without union: write both through one
        # join-shaped min aggregate each, then combine by joining the
        # neighbour mins onto own labels (left side always has every
        # node, so an inner join is total)
        nbr_min = _join_safe(
            msgs.groupby('node').aggregate(Min('cand', alias_name='nm')),
            num_partitions)
        # _join_safe: the join emits schemaless empty blocks for empty
        # partitions (Ray 2.49); feeding them into the next join makes
        # Acero fail with "no match for FieldRef(lbl)" — rebuild the
        # blocks before stepped is joined again
        stepped = _join_safe(
            own.join(nbr_min, 'inner',
                     num_partitions=num_partitions,
                     on=('node',), right_on=('node',))
            .map_batches(
                lambda t: pa.table({
                    'node': t['node'],
                    'lbl': pc.min_element_wise(t['cand'],
                                               t['nm'])}),
                batch_format='pyarrow'),
            num_partitions)
        # pointer jump: lbl <- lbl(lbl).  Every lbl is a node id that
        # appears in `labels` (labels only ever take existing ids), so
        # the inner self-join is total.
        jump_src = stepped.map_batches(
            lambda t: pa.table({'jnode': t['node'], 'jlbl': t['lbl']}),
            batch_format='pyarrow')
        labels = (stepped.join(jump_src, 'inner',
                               num_partitions=num_partitions,
                               on=('lbl',), right_on=('jnode',))
                  .map_batches(
                      lambda t: pa.table({'node': t['node'],
                                          'lbl': t['jlbl']}),
                      batch_format='pyarrow')).materialize()
        cur_sum = labels.aggregate(Sum('lbl'))['sum(lbl)']
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:  # pragma: no cover
        raise RuntimeError('connected components did not converge')

    out = labels.sort('node').take_all()
    return pa.table({
        'doc_id': pa.array([r['node'] for r in out], pa.int64()),
        'cluster_id': pa.array([r['lbl'] for r in out], pa.int64())})


def connected_components(edges, num_partitions: int = 8,
                         force_distributed: bool = False) -> pa.Table:
    """Label every node of an (id_a, id_b) edge list with the min node
    id of its connected component.

    ``edges`` is a pyarrow Table or a Ray Dataset.  Returns a pyarrow
    Table (doc_id, cluster_id) sorted by doc_id — answer-sized: only
    docs that appear in at least one pair are rows (singletons are
    their own implicit cluster).
    """
    if isinstance(edges, pa.Table):
        n = edges.num_rows
        if n <= DRIVER_EDGE_LIMIT and not force_distributed:
            return _cc_numpy(
                edges.column('id_a').to_numpy(zero_copy_only=False),
                edges.column('id_b').to_numpy(zero_copy_only=False))
        import ray.data
        return _cc_dataset(ray.data.from_arrow(edges), num_partitions)
    if not force_distributed:
        # Dataset input: fold on the driver only if answer-sized
        n = edges.count()
        if n <= DRIVER_EDGE_LIMIT:
            rows = edges.select_columns(['id_a', 'id_b']).take_all()
            return _cc_numpy(
                np.array([r['id_a'] for r in rows], np.int64),
                np.array([r['id_b'] for r in rows], np.int64))
    return _cc_dataset(edges, num_partitions)
