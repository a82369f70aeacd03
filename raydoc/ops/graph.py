"""Graph connectivity over pair/edge Datasets.

The dedup family (raydoc/ops/dedup.py) emits near-duplicate PAIRS; a
training-data pipeline usually wants duplicate CLUSTERS — "keep one doc
per group of mutual near-dups" — which is connected components over the
pair graph. The reference has no graph operator at all (its nearest is
exact drop_duplicates, /root/reference/agent/component/base.py:474);
this is one of the scale extensions SURVEY.md §2.5 calls out.

Algorithm: distributed min-label propagation. Every node starts
labelled with its own id; each round every node takes the minimum label
among itself and its neighbours; at the fixpoint each component is
labelled with its minimum member id. Rounds are Dataset-native — a
tag-union-groupby message join plus a partial-agg min — so each round
is two hash shuffles over (node, label) rows, never document payloads.
Iteration state is materialized per round (small: 16 B per node in a
pair), which is the standard Ray Data pattern for iterative algorithms
— the lineage graph must not grow with the round count.

Convergence: labels only ever decrease, so the global label sum is
strictly decreasing until the fixpoint; an unchanged sum IS
convergence (one cheap scalar aggregate per round, no change-count
join). Worst-case rounds = graph diameter; near-dup clusters are
low-diameter in practice, and ``max_rounds`` bounds pathological
chains (the partial result after r rounds is each node's minimum id
within r hops — still a valid refinement, never wrong labels).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["connected_components"]


def connected_components(
    pairs,
    id_a: str = "id_a",
    id_b: str = "id_b",
    out_id: str = "doc_id",
    out_label: str = "cluster_id",
    max_rounds: int = 64,
    num_partitions: int | None = None,
):
    """Edge-list Dataset (id_a, id_b) -> (out_id, out_label) with
    out_label = the minimum id reachable from out_id. One row per
    distinct node appearing in the pairs (singleton docs are their own
    trivial cluster and are not emitted — semi-join the corpus against
    this result to act on duplicates only)."""
    from ray.data.aggregate import Min

    from raydoc.ops.relational import _cpu_cap

    import numpy as np

    # ADVICE r02: knob exposed — size P ~ message_bytes/256MB at scale
    P = num_partitions or max(4, _cpu_cap())
    _MAXI64 = np.iinfo(np.int64).max

    # node set with initial labels: each endpoint labels itself
    def _nodes(b: pa.Table) -> pa.Table:
        both = np.concatenate(
            [b.column(id_a).to_numpy(zero_copy_only=False).astype(np.int64),
             b.column(id_b).to_numpy(zero_copy_only=False).astype(np.int64)]
        )
        u = np.unique(both)
        arr = pa.array(u, pa.int64())
        return pa.Table.from_pydict({"node": arr, "label": arr})

    labels = (
        pairs.map_batches(_nodes, batch_format="pyarrow")
        .groupby("node").aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    # undirected edges as (src, dst) message routes, both directions —
    # computed once, reused every round
    def _edges(b: pa.Table) -> pa.Table:
        a = b.column(id_a).to_numpy(zero_copy_only=False).astype(np.int64)
        c = b.column(id_b).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {"src": pa.array(np.concatenate([a, c]), pa.int64()),
             "dst": pa.array(np.concatenate([c, a]), pa.int64())}
        )

    edges = pairs.map_batches(_edges, batch_format="pyarrow").materialize()

    def _label_sum(lbl) -> int:
        return lbl.sum("label") or 0

    # message join via tag-union-groupby (one shuffle on the node
    # key): each group holds the node's label row (dst null) and
    # its outgoing edge rows (label null); emit (dst, label) per
    # edge plus the node's own (node, label).
    def _tag_label(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"key": b.column("node"),
             "dst": pa.nulls(b.num_rows, pa.int64()),
             "label": b.column("label")}
        )

    def _tag_edge(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"key": b.column("src"), "dst": b.column("dst"),
             "label": pa.nulls(b.num_rows, pa.int64())}
        )

    # pointer jumping (r03): each node's LABEL TABLE itself, read as
    # (src=label, dst=node) edges, propagates label[label[n]] to n —
    # the classic hook + jump, so a chain of length L (exactly what the
    # per-gram chain pair generation emits for an L-doc dup cluster)
    # converges in O(log L) supersteps instead of L one-hop rounds.
    def _label_as_edges(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(b.column("node"), b.column("label")))
        b = b.filter(keep)  # self-labeled nodes jump nowhere
        return pa.Table.from_pydict(
            {"src": b.column("label"), "dst": b.column("node")}
        )

    prev_sum = _label_sum(labels)
    converged = False
    for _round in range(max_rounds):
        # the node-key space is corpus-sized, so the message emit is
        # hash-bucketed into P coarse groups and VECTORIZED per bucket
        # (sort by key, per-run min via reduceat, np.repeat to the edge
        # rows) instead of one Python map_groups call per node; the
        # label min is Ray's native block-vectorized aggregate.
        def _bucket(b: pa.Table) -> pa.Table:
            k = b.column("key").combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            part = np.mod(k.astype(np.uint64), np.uint64(P)).astype(np.int64)
            return b.append_column("_part", pa.array(part))

        def _emit_bucket(group: pa.Table) -> pa.Table:
            if group.num_rows == 0:  # ADVICE r02: reduceat dies on empty
                return pa.Table.from_pydict(
                    {"node": pa.array([], pa.int64()),
                     "label": pa.array([], pa.int64())})
            idx = pc.sort_indices(group, sort_keys=[("key", "ascending")])
            t = group.take(idx)
            key = t.column("key").combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            lab = pc.fill_null(t.column("label").combine_chunks(), _MAXI64) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            dst = t.column("dst").combine_chunks()
            n = len(key)
            starts = np.flatnonzero(
                np.concatenate(([True], key[1:] != key[:-1])))
            rmin = np.minimum.reduceat(lab, starts)
            run_len = np.diff(np.append(starts, n))
            run_of = np.repeat(np.arange(len(starts)), run_len)
            dvalid = pc.is_valid(dst).to_numpy(zero_copy_only=False)
            dnp = pc.fill_null(dst, 0).to_numpy(
                zero_copy_only=False).astype(np.int64)
            out_nodes = np.concatenate([key[starts], dnp[dvalid]])
            out_labels = np.concatenate([rmin, rmin[run_of[dvalid]]])
            return pa.Table.from_pydict(
                {"node": pa.array(out_nodes, pa.int64()),
                 "label": pa.array(out_labels, pa.int64())}
            )

        jump_edges = labels.map_batches(_label_as_edges,
                                        batch_format="pyarrow")
        tagged = labels.map_batches(_tag_label, batch_format="pyarrow").union(
            edges.map_batches(_tag_edge, batch_format="pyarrow"),
            jump_edges.map_batches(_tag_edge, batch_format="pyarrow"),
        )
        msgs = tagged.map_batches(_bucket, batch_format="pyarrow") \
            .groupby("_part").map_groups(_emit_bucket, batch_format="pyarrow")
        # repartition BOUNDS the per-round block count: the sort-based
        # aggregate emits one block per input block, and the 3-way
        # union would otherwise compound blocks geometrically across
        # rounds (measured: round walls 14 -> 19 -> 46 s at 110k nodes
        # from task-count growth alone, data constant at 16 B/node)
        labels = msgs.groupby("node").aggregate(
            Min("label", alias_name="label")).repartition(P).materialize()
        cur_sum = _label_sum(labels)
        import os as _os
        if _os.environ.get("RAYDOC_CC_DEBUG"):
            import time as _time
            print(f"CCDBG round={_round} sum={cur_sum} t={_time.time():.1f}",
                  flush=True)
        if cur_sum == prev_sum:  # labels only decrease: fixpoint reached
            converged = True
            break
        prev_sum = cur_sum

    if not converged:
        # one-hop-per-round propagation converges in diameter(G) rounds;
        # near-dup clusters have tiny diameters, so exhausting the cap
        # means the input is NOT that shape — non-converged labels are
        # silently WRONG cluster ids, so fail loudly instead (r03)
        raise RuntimeError(
            f"connected_components did not converge within max_rounds="
            f"{max_rounds}; a component's diameter exceeds the round cap "
            "— raise max_rounds (cost: one shuffle per extra round)")

    def _rename(b: pa.Table) -> pa.Table:
        return b.rename_columns([out_id, out_label])

    return labels.map_batches(_rename, batch_format="pyarrow")
