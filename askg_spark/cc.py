"""Connected components over the candidate-match edge graph.

Partition-local union-find contraction, expressed as a SINGLE lazy
DataFrame plan — zero driver-synchronized iterations:

  round k: repartition edges by hash of one endpoint (alternating
           src / dst across rounds) -> per-partition union-find
           (Arrow-batched mapInPandas; the generator sees the WHOLE
           partition, batch by batch) -> emit star edges
           (x, local_min_root(x)) for every vertex seen
  final:   collapse to one partition -> union-find -> exact labels

Why this shape (vs the round-1 large-star/small-star label loop):
each per-partition spanning forest preserves the connectivity of that
partition's edge set, so the union of emitted stars has exactly the
connectivity of the full graph — every round is a sound contraction,
and the final single-partition pass resolves all cross-partition
merges exactly, rooted at the component-min id (deterministic under
any partitioning). Alternating the partition key between rounds makes
chains contract (edges (a,b) hashed by dst and (b,c) hashed by src
both land on hash(b)), the same progress guarantee alternating
large-star/small-star relies on (Kiveris et al., SOCC'14).

Scale design / measured rationale:
  * The round-1 loop anti-scaled (cc 133s at local[8] -> 287s at
    local[32] on identical input, BENCH.md): ~6 shuffle stages + one
    driver collect per iteration x O(log n) iterations is pure
    scheduling latency on tiny label frames. This plan is 4 shuffles
    + 4 mapInPandas total (3 contraction rounds u/v/u — the final
    u-keyed round collapses each vertex's per-partition duplicate star
    rows so the serial single-task pass reads ~one row per vertex),
    materialized once by the downstream join —
    no localCheckpoint (the plan is linear, not iterative), so the
    MEMORY_ONLY-eviction failure mode flagged in ADVICE.md is gone.
  * Memory bound: the final task holds one row per vertex incident to
    an edge — the MATCHED mention set, orders of magnitude smaller
    than the corpus (at 10^12 pages the candidate-match graph is the
    output of LSH blocking + exact keys, not all pages). For graphs
    whose contracted star set exceeds single-task memory (~10^8
    vertices), raise `contract_rounds` and split the final collapse
    into a root-range merge — the contraction rounds themselves are
    fully parallel and bounded by partition size.

Reference analog: the greedy transitive merge of
/root/reference/src/deduplication.py:323-373 is single-pass CC on the
similarity graph; we compute the true transitive closure (documented
deviation — greedy misses chains, CC does not; the P/R gate tolerates
and the fixture includes a chain cluster to prove transitivity).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F

_STAR_SCHEMA = "u string, v string"


def _uf_stars(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Whole-partition union-find; emits (x, min-root(x)) per vertex.
    Union-by-min + path compression: roots are always the component's
    lexicographic min, so output is deterministic.

    Int-coded: ids are factorized once and ranked by sorted order so
    union-by-min over int ranks IS union-by-min over the strings; the
    find/union loop then runs over plain Python ints (a list-backed
    parent array), ~4x faster than the string-keyed dict this replaces
    — the single-partition final collapse is the pipeline's one serial
    task, so its constant factor is wall time at every scale."""
    import numpy as np

    parts = [pdf for pdf in batches if len(pdf)]
    if not parts:
        yield pd.DataFrame({"u": pd.Series([], dtype="str"),
                            "v": pd.Series([], dtype="str")})
        return
    pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
    codes, uniques = pd.factorize(
        pd.concat([pdf["u"], pdf["v"]], ignore_index=True))
    uniq = np.asarray(uniques)
    n_ids = len(uniq)
    order = np.argsort(uniq)                 # rank -> factorize code
    rank = np.empty(n_ids, dtype=np.int64)   # factorize code -> rank
    rank[order] = np.arange(n_ids)
    n_edges = len(pdf)
    eu = rank[codes[:n_edges]]
    ev = rank[codes[n_edges:]]
    roots = _min_label(n_ids, eu, ev)
    by_rank = uniq[order]                    # rank -> id string
    yield pd.DataFrame({"u": by_rank, "v": by_rank[roots]})


def _min_label(n_ids: int, eu, ev):
    """Component-min labels for vertices 0..n_ids-1 under edges
    (eu[i], ev[i]) — vectorized min-label propagation with pointer
    jumping, exact-UF fallback.

    Each round scatters the per-edge min label onto both endpoints
    (``np.minimum.at``) then compresses ``lab`` to idempotence by
    pointer jumping (``lab = lab[lab]``). Invariants: lab[x] <= x,
    monotone non-increasing, and lab[x] is always a vertex of x's
    component; at the fixpoint (every edge label-equal AND lab
    idempotent) labels are constant along every edge path, hence
    exactly the component minimum. O(E) numpy work per round,
    ~log(diameter) rounds — the serial final-collapse task runs this
    over millions of rows at numpy speed instead of a Python
    find/union loop (measured ~3x on the 2M-page corpus collapse).
    The exact union-find loop remains as a guaranteed-terminating
    fallback on the (contracted, label-distinct) residual edges if
    propagation hasn't converged after 64 rounds — never observed,
    but correctness must not depend on a convergence-speed argument.
    """
    import numpy as np

    lab = np.arange(n_ids, dtype=np.int64)
    if len(eu) == 0:
        return lab
    for _ in range(64):
        m = np.minimum(lab[eu], lab[ev])
        np.minimum.at(lab, eu, m)
        np.minimum.at(lab, ev, m)
        while True:                          # pointer jumping
            l2 = lab[lab]
            if np.array_equal(l2, lab):
                break
            lab = l2
        if np.array_equal(lab[eu], lab[ev]):
            return lab
    # exact fallback: union-find over the contracted label graph
    ru, rv = lab[eu], lab[ev]
    keep = ru != rv
    parent = list(range(n_ids))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]    # halving
            x = parent[x]
        return x

    for a, b in zip(ru[keep].tolist(), rv[keep].tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra                  # attach under the min rank
    return np.fromiter((find(int(x)) for x in lab),
                       dtype=np.int64, count=n_ids)


def connected_components(
    edges: DataFrame, vertices: DataFrame, max_iter: int = 25,
    contract_rounds: int = 3, contract_partitions: int | None = None,
) -> DataFrame:
    """edges(src,dst) + vertices(id) -> (id, component) where component
    is the lexicographic min id reachable.

    ``contract_rounds`` parallel contraction rounds (alternating
    endpoint hashing) then one exact single-partition collapse — a
    linear plan executed once, with a single driver sync (the label
    checkpoint below) instead of the round-1 loop's O(log n) syncs.
    ``max_iter`` caps the rounds (API compatibility with the round-1
    iterative implementation)."""
    spark = edges.sparkSession
    # Contraction width follows CORE count, not the (4x larger)
    # shuffle-partition conf: a round's output carries one star row per
    # (partition, vertex-touching-it), so over-splitting multiplies
    # duplicate rows into the single-task final collapse — measured at
    # a 576k-edge graph: n_part 32 vs 8 grew the collapse from ~6s to
    # 17s of serial wall. Per-partition union-find memory is one int
    # pair per local vertex; on a real cluster defaultParallelism =
    # total executor cores, which scales with the data. Pass
    # contract_partitions explicitly for graphs whose edges-per-core
    # exceed partition memory.
    n_part = contract_partitions or spark.sparkContext.defaultParallelism
    cur = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    for r in range(min(contract_rounds, max_iter)):
        key = "u" if r % 2 == 0 else "v"
        cur = cur.repartition(n_part, key).mapInPandas(
            _uf_stars, schema=_STAR_SCHEMA)
        # Self-stars (r, r) — one per (partition, local component) —
        # carry zero connectivity: every non-root vertex's row already
        # names its root as v, so roots stay reachable through kept
        # rows, and a vertex ALL of whose rows are self-stars is
        # isolated in the star graph, which is exactly the case the
        # singles anti-join below labels correctly. Dropping them
        # shrinks every inter-round shuffle AND the single-task final
        # collapse by ~the local-component count (millions of rows on
        # web corpora, where most match groups are 2-4 mentions).
        cur = cur.filter(F.col("u") != F.col("v"))
    labels = (
        cur.repartition(1)
        .mapInPandas(_uf_stars, schema=_STAR_SCHEMA)
        .select(F.col("u").alias("id"), F.col("v").alias("label"))
    )
    # The label frame is referenced TWICE below (the union and the
    # singles anti-join). Measured on Spark 4 local mode: relying on
    # plan-matching (persist) to dedupe the two references is NOT
    # reliable for plans containing Python mapInPandas stages under
    # AQE — the event log shows the full upstream DAG re-executing per
    # reference. localCheckpoint truncates the plan to a leaf, so the
    # contraction chain runs exactly once no matter how many consumers
    # reference it. Labels hold one row per vertex incident to an edge
    # (the matched-mention set), orders of magnitude smaller than the
    # corpus, so the checkpoint is cheap even at 10^12 documents.
    labels = labels.localCheckpoint(
        eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    # vertices touching no edge are their own component
    singles = vertices.join(labels.select("id"), "id", "left_anti") \
        .select("id", F.col("id").alias("label"))
    return labels.unionByName(singles) \
        .select("id", F.col("label").alias("component"))
