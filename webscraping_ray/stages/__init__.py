"""Vectorized ``map_batches`` stages (extraction, dedup, similarity,
text stats, multimodal).  Every stage is a callable class usable as a
Ray Data actor-pool stage: setup in ``__init__``, batch work in
``__call__``; Arrow in / Arrow out wherever possible."""


#: fractional CPU per pooled actor: a pipeline chaining two actor-pool
#: stages (e.g. ivf assign → topk) must co-fit its pools in the
#: cluster, or the downstream pool never schedules and the driver's
#: ray.get deadlocks.  Half a CPU each lets two full-size pools plus
#: the read tasks coexist on any cluster size.
POOL_NUM_CPUS = 0.5


def pool_size(concurrency=None, cap=None) -> int:
    """Actor-pool size for a class-based ``map_batches`` stage.

    Ray Data requires explicit ``concurrency`` for callable classes;
    default to cluster CPUs minus one (a pool reserving every CPU can
    deadlock a driver-side ``ray.get``) so stages scale with the
    cluster instead of being pinned to a sandbox constant.  Combine
    with ``num_cpus=POOL_NUM_CPUS`` so chained pools co-fit.
    """
    if concurrency is not None:
        return concurrency
    import ray

    n = int(ray.cluster_resources().get('CPU', 8)) if ray.is_initialized() else 8
    k = max(2, n - 1)
    return min(k, cap) if cap else k
