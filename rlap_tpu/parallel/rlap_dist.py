"""Distributed rLap: edge-partitioned randomized Schur complement across a
device mesh.

The multi-chip formulation of the elimination kernel (SURVEY.md §2.3
"Distributed rLap"; reference semantics `rlap/csrc/preconditioner.cc:713-787`).
Edges are partitioned by sender block (`parallel/partition.py`), so for any
vertex i the whole column (i, *) is local to owner(i):

* **Selection is replicated.** Degrees and neighbor-minima are EXACT for
  owned nodes locally (one scatter-add / scatter-min over local edges,
  since a node's whole column lives on its owner) and replicated with one
  block `all_gather` (n/P elements sent per shard — not a full-n
  psum/pmin); every shard then computes the same independent set (same
  PRNG key -> same permutation). For o_v="random" the priority is the
  permutation position itself (the reference's own order), which removes
  the per-round degree pass and its collective.
* **Elimination is shard-local.** Each shard groups its eliminated owned
  columns with one local sort and runs the same suffix-CDF star->clique
  sampler as the single-chip kernel (see `ops/rlap.py`).
* **Emissions are routed.** A sampled clique edge (j, k) belongs on
  owner(j) and its mirror (k, j) on owner(k); records are bucketed by
  destination with a local sort and exchanged with ONE `all_to_all` per
  round — the boundary-clique exchange. Mirror kills are local (the
  eliminated mask is replicated).
* **Coalescing stays shard-local**: duplicates of (i, j) all live on
  owner(i) and merge in the next round's grouping sort, with the same
  ghost-run trick as the single-chip kernel.

The single-chip kernel's in-place mirror-pair write is exactly this
exchange specialized to P=1.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rlap_tpu.core import graph as G
from rlap_tpu.core.graph import Graph
from rlap_tpu.ops.rlap import (_INT_MAX, _last_le_lookup, _segmented_cumsum,
                               _segmented_maxscan_rev)


def _eliminate_local_rounds(s, r, w, key, t, *, n: int, num_shards: int,
                            axis: str, o_v: str, o_n: str = "random",
                            subiters: int = 3, slack: int = 2):
    """Per-shard body run under shard_map. s/r/w: the shard's local edges
    (senders all in this shard's node block). Returns local edge arrays of
    the Schur complement plus (removed, rounds, overflow) replicated
    scalars.

    `slack` multiplies the per-shard capacity: clique emissions concentrate
    on high-degree survivors, so a shard's pool can grow past its input
    edge count even though the global edge count shrinks.
    """
    in_cap = s.shape[0]
    cap = slack * in_cap
    pad = cap - in_cap
    s = jnp.concatenate([s, jnp.full((pad,), n, s.dtype)])
    r = jnp.concatenate([r, jnp.full((pad,), n, r.dtype)])
    w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
    wdtype = w.dtype
    B = n + 1
    # (owner, other) pairs pack into one int32 key only while n*(n+2)
    # fits; beyond that (ogbn-arxiv scale) every keyed pass uses two-key
    # sorts on the raw ids and the all_to_all carries (s, r, w) lanes
    packed = n * (n + 2) < _INT_MAX
    big = jnp.asarray(_INT_MAX, jnp.int32)
    t1 = jnp.ones((1,), bool)
    f1 = jnp.zeros((1,), bool)
    zero_w = jnp.zeros((), wdtype)
    shard = jax.lax.axis_index(axis)

    # identical on every shard: same key -> same permutation/pending
    key, kperm = jax.random.split(key)
    perm = jax.random.permutation(kperm, n)
    pos = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    if o_v == "random":
        pending = pos < t
    else:
        pending = jnp.ones((n,), bool)

    # selection state rides the block all_gather, whose outputs shard_map
    # types as device-varying (they are value-identical across shards by
    # construction); mark those carries varying up front so the while_loop
    # carry types match, and reduce them back at exit
    def vary(x):
        return jax.lax.pcast(x, (axis,), to='varying')

    state = dict(
        s=s, r=r, w=w, pending=vary(pending),
        removed=vary(jnp.zeros((), jnp.int32)),
        npend=vary(jnp.sum(pending.astype(jnp.int32))),
        rnd=jnp.zeros((), jnp.int32),
        overflow=vary(jnp.zeros((), bool)),
    )

    def cond(st):
        return (st["npend"] > 0) & (st["removed"] < t)

    # sender-block partitioning makes every vertex's whole column local to
    # its owner, so per-node reductions (degree, neighbor minima) are
    # EXACT on the owner shard — they need only a block all_gather (n/P
    # elements sent per shard) to replicate, not a full-n psum/pmin.
    block_sz = -(-n // num_shards)
    nblk = num_shards * block_sz
    blk_lo = shard * block_sz

    def gather_owned(part):
        own = jax.lax.dynamic_slice(part, (blk_lo,), (block_sz,))
        return jax.lax.all_gather(own, axis, tiled=True)[:n]

    def body(st):
        s, r, w = st["s"], st["r"], st["w"]
        pending = st["pending"]
        rkey = jax.random.fold_in(key, st["rnd"])
        ukey = jax.random.fold_in(rkey, shard)
        live = s < n

        if o_v == "random":
            # position priority IS the reference's o_v="random" order
            # (preconditioner.cc:588-613); skips the degree pass + its
            # collective entirely (see ops/rlap.py banded kernel notes)
            prio = pos
        else:
            deg_part = jnp.zeros((nblk + 1,), jnp.int32).at[s].add(
                live.astype(jnp.int32))[:nblk]
            deg = gather_owned(deg_part)
            dclamp = max(1, (_INT_MAX - n) // (n + 1) - 1)
            prio = jnp.minimum(deg, dclamp) * (n + 1) + pos

        # ---- packed Luby sub-rounds; owner-exact minima, block-gathered.
        # The scatter-min target is the shard's OWN node block (senders of
        # local edges are in-block by partitioning), not the full n table:
        # the per-sub-round table init is block-sized, so the replicated
        # vertex-side work per shard stays ~n/P instead of n. -------------
        s_blk = jnp.where(live, s - blk_lo, block_sz)
        elim = jnp.zeros((n,), bool)
        cand = pending
        sel = jnp.zeros((n,), bool)
        for it in range(max(1, subiters)):
            pack = jnp.where(sel, -1, jnp.where(cand, prio, big))
            pack_pad = jnp.concatenate([pack, jnp.full((1,), big, jnp.int32)])
            nbr = jnp.where(live, pack_pad[r], big)
            nmin_blk = jnp.full((block_sz + 1,), big,
                                jnp.int32).at[s_blk].min(nbr)[:block_sz]
            nmin = jax.lax.all_gather(nmin_blk, axis, tiled=True)[:n]
            sel = cand & (prio < nmin) & (nmin >= 0)
            elim = elim | sel
            cand = cand & jnp.logical_not(sel) & (nmin >= 0)

        if o_v != "random":
            remaining = t - st["removed"]
            sorted_prio = jnp.sort(jnp.where(elim, prio, big))
            kth = sorted_prio[jnp.clip(remaining - 1, 0, n - 1)]
            elim = elim & (prio <= kth) & (remaining > 0)

        b_count = jnp.sum(elim.astype(jnp.int32))
        elim_pad = jnp.concatenate([elim, f1])
        es = elim_pad[s] & live
        er = elim_pad[r] & live

        # ---- group eliminated local columns; merge duplicate copies ------
        # columns are sender-local, so the owner of every touched slot is
        # its own sender: group by (s, r) over touched slots only
        keep_w = jnp.where(es | er, zero_w, w)   # survivors keep weight
        if packed:
            rho = jnp.where(es, s * B + r, big)
            kap = s * B + r
            rho_s, kap_s, w_s, keep_s = jax.lax.sort(
                (rho, kap, w, keep_w), num_keys=1)
            touched = rho_s < big
            surv_s_a = kap_s // B
            surv_r_a = kap_s - surv_s_a * B
        else:
            ow = jnp.where(es, s, big)
            ot = jnp.where(es, r, big)
            ow_s, ot_s, surv_s_a, surv_r_a, w_s, keep_s = jax.lax.sort(
                (ow, ot, s, r, w, keep_w), num_keys=2)
            touched = ow_s < big

        # the rho sort puts touched slots at the front, so the whole
        # sampling + routing phase runs on a half-cap static prefix;
        # rounds whose touched set outgrows it (possible once the pool
        # has grown into its slack region) flag overflow and the caller
        # escalates with doubled slack
        EC = max(cap // 2, 128)
        over_touch = jnp.any(touched[EC:])
        touched_e = touched[:EC]
        w_e = w_s[:EC]
        if packed:
            rho_e = rho_s[:EC]
            owner_col = jnp.where(touched_e, rho_e // B, n)
            other = jnp.where(touched_e, rho_e - owner_col * B, n)
            same = rho_e[1:] == rho_e[:-1]
        else:
            owner_col = jnp.where(touched_e, ow_s[:EC], n)
            other = jnp.where(touched_e, ot_s[:EC], n)
            same = ((ow_s[1:EC] == ow_s[:EC - 1])
                    & (ot_s[1:EC] == ot_s[:EC - 1])) & touched_e[1:]
        head_run = jnp.concatenate([t1, jnp.logical_not(same)]) & touched_e
        is_tail = jnp.concatenate([jnp.logical_not(same), t1]) & touched_e
        run_sum = _segmented_cumsum(w_e, head_run)
        v = jnp.where(is_tail, run_sum, zero_w)

        if o_n in ("asc", "desc"):
            # order each eliminated column by merged weight before the
            # suffix-CDF pass (the o_n sort of compressColumn,
            # preconditioner.cc:295-307) — same tail sort as the
            # single-chip kernel (ops/rlap.py o_n branch); the sharded
            # kernel drops all touched copies (emissions are routed, not
            # written in place), so only (owner, other, v) need reorder
            own_t = jnp.where(is_tail, owner_col, big)
            o_key = v.astype(jnp.float32)
            o_key = jnp.where(is_tail,
                              o_key if o_n == "asc" else -o_key,
                              jnp.asarray(jnp.inf, jnp.float32))
            own_t, _, other, v = jax.lax.sort(
                (own_t, o_key, other, v), num_keys=2)
            owner_col = jnp.where(own_t < big, own_t, n)
            is_tail = own_t < big

        hs = jnp.concatenate([t1, owner_col[1:] != owner_col[:-1]])
        cum = _segmented_cumsum(v, hs)
        csum = _segmented_maxscan_rev(cum, hs)
        suffix = csum - cum

        if o_v == "coarsen":
            u_node = jax.random.uniform(rkey, (n + 1,), dtype=jnp.float32)
            rv = u_node[jnp.clip(owner_col, 0, n)].astype(wdtype) * csum
            maybe = is_tail & (csum > 0)
        else:
            u = jax.random.uniform(ukey, (EC,), dtype=jnp.float32
                                   ).astype(wdtype)
            rv = cum + u * suffix
            maybe = is_tail & (suffix > 0)
        rv = jnp.minimum(rv, jnp.nextafter(csum, jnp.zeros_like(csum)))

        q = _last_le_lookup(
            (owner_col, cum),
            (jnp.where(maybe, owner_col, n + 1),
             jnp.where(maybe, rv, zero_w))) + 1
        q = jnp.clip(q, 0, EC - 1)
        partner = other[q]

        if o_v == "coarsen":
            idx = jnp.arange(EC, dtype=jnp.int32)
            w_k = v[q]
            emit = maybe & (idx != q)
            denom = jnp.where(v + w_k > 0, v + w_k, 1.0)
            wnew = jnp.where(emit, v * w_k / denom, zero_w)
        else:
            emit = maybe
            csafe = jnp.where(csum > 0, csum, 1.0)
            wnew = jnp.where(emit, v * suffix / csafe, zero_w)

        # ---- route emissions: (other, partner) -> owner(other),
        #      (partner, other) -> owner(partner) -------------------------
        block = -(-n // num_shards)
        e_s = jnp.concatenate([jnp.where(emit, other, n),
                               jnp.where(emit, partner, n)])
        e_r = jnp.concatenate([jnp.where(emit, partner, n),
                               jnp.where(emit, other, n)])
        e_w = jnp.concatenate([wnew, wnew])
        dest = jnp.where(e_s < n,
                         jnp.minimum(e_s // block, num_shards - 1),
                         num_shards)
        # bucket by destination with one local sort, then place each record
        # at (dest, rank-within-dest) in the exchange buffer. Emission
        # counts measured per round (tools/measure_dist_routing.py): a
        # round's emissions are <= the touched-column tails (~cap/8 per
        # shard at subiters=3) and spread over P destinations, so a
        # cap/(4P) per-destination buffer keeps ~2x headroom on balanced
        # graphs while halving the received block (and the survivor merge
        # sort behind it); a skewed graph (hub column emitting into one
        # shard) trips `over_route` and `eliminate_sharded` escalates by
        # re-running with doubled slack, which doubles cap_route too.
        cap_route = max(min(cap // max(4, 4 * num_shards), cap), 128)
        didx = jnp.arange(2 * EC, dtype=jnp.int32)
        NBUF = num_shards * cap_route
        if packed:
            ekap = jnp.where(e_s < n, e_s * B + e_r, n * B + n)
            dsort, ksort, wsort = jax.lax.sort((dest, ekap, e_w),
                                               num_keys=1)
        else:
            dsort, essort, ersort, wsort = jax.lax.sort(
                (dest, e_s, e_r, e_w), num_keys=1)
        dstart = jnp.searchsorted(dsort, jnp.arange(num_shards + 1,
                                                    dtype=jnp.int32),
                                  side="left").astype(jnp.int32)
        rank = didx - dstart[jnp.clip(dsort, 0, num_shards)]
        slot = jnp.where(dsort < num_shards,
                         dsort * cap_route + jnp.minimum(rank, cap_route - 1),
                         NBUF)
        over_route = jnp.any((rank >= cap_route) & (dsort < num_shards))
        # ONE all_to_all: ids and weight ride together as int32 lanes
        # (2 lanes packed, 3 beyond the packing bound), keeping one
        # collective barrier per round
        buf_w = jnp.zeros((NBUF + 1,), wdtype).at[slot].set(wsort)[:-1]
        buf_wi = jax.lax.bitcast_convert_type(
            buf_w.astype(jnp.float32), jnp.int32)
        if packed:
            buf_k = jnp.full((NBUF + 1,), n * B + n,
                             jnp.int32).at[slot].set(ksort)[:-1]
            lanes = [buf_k, buf_wi]
        else:
            buf_s = jnp.full((NBUF + 1,), n,
                             jnp.int32).at[slot].set(essort)[:-1]
            buf_r = jnp.full((NBUF + 1,), n,
                             jnp.int32).at[slot].set(ersort)[:-1]
            lanes = [buf_s, buf_r, buf_wi]
        buf = jnp.stack([x.reshape(num_shards, cap_route) for x in lanes],
                        axis=1)
        recv = jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0,
                                  tiled=False)
        recv_w = jax.lax.bitcast_convert_type(
            recv[:, len(lanes) - 1, :], jnp.float32).astype(
                wdtype).reshape(-1)

        # ---- merge survivors + received, keep the cap lowest keys --------
        surv_w = jnp.where(keep_s > 0, keep_s, zero_w)
        if packed:
            recv_k = recv[:, 0, :].reshape(-1)
            surv_k = jnp.where(keep_s > 0, kap_s, n * B + n)
            all_k = jnp.concatenate([surv_k, recv_k])
            all_w = jnp.concatenate([surv_w, recv_w])
            all_k, all_w = jax.lax.sort((all_k, all_w), num_keys=1)
            new_k = all_k[:cap]
            w_new = all_w[:cap]
            over_cap = jnp.any(all_k[cap:] < n * B + n)
            s_new = new_k // B
            r_new = new_k - s_new * B
        else:
            recv_s = recv[:, 0, :].reshape(-1)
            recv_r = recv[:, 1, :].reshape(-1)
            surv_sk = jnp.where(keep_s > 0, surv_s_a, n)
            surv_rk = jnp.where(keep_s > 0, surv_r_a, n)
            all_s = jnp.concatenate([surv_sk, recv_s])
            all_r = jnp.concatenate([surv_rk, recv_r])
            all_w = jnp.concatenate([surv_w, recv_w])
            all_s, all_r, all_w = jax.lax.sort((all_s, all_r, all_w),
                                               num_keys=2)
            s_new = all_s[:cap]
            r_new = all_r[:cap]
            w_new = all_w[:cap]
            over_cap = jnp.any(all_s[cap:] < n)
        w_new = jnp.where(s_new < n, w_new, zero_w)

        pending_next = pending & jnp.logical_not(elim)
        return dict(
            s=s_new, r=r_new, w=w_new,
            pending=pending_next,
            removed=st["removed"] + b_count,
            npend=jnp.sum(pending_next.astype(jnp.int32)),
            rnd=st["rnd"] + 1,
            overflow=st["overflow"] | over_touch | over_route | over_cap,
        )

    out = jax.lax.while_loop(cond, body, state)
    overflow = jax.lax.pmax(out["overflow"].astype(jnp.int32), axis) > 0
    removed = jax.lax.pmax(out["removed"], axis)
    return (out["s"], out["r"], out["w"], removed, out["rnd"],
            overflow)


@functools.partial(jax.jit,
                   static_argnames=("n", "mesh", "axis", "o_v", "o_n",
                                    "subiters", "slack"))
def _eliminate_sharded_jit(senders, receivers, weights, key, t, n,
                           mesh: Mesh, axis: str, o_v: str,
                           o_n: str = "random", subiters: int = 3,
                           slack: int = 2):
    num_shards = mesh.shape[axis]
    fn = shard_map(
        functools.partial(_eliminate_local_rounds, n=int(n),
                          num_shards=num_shards, axis=axis, o_v=o_v,
                          o_n=o_n, subiters=subiters, slack=slack),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P(), P(), P()),
    )
    return fn(senders, receivers, weights, key, t)


def eliminate_sharded(g: Graph, key: jax.Array, num_remove, mesh: Mesh,
                      axis: str = "data", o_v: str = "random",
                      o_n: str = "random", subiters: int = 3,
                      slack: int = 2, max_escalations: int = 0
                      ) -> Tuple[Graph, jax.Array, jax.Array]:
    """Multi-chip `eliminate` (all o_v x o_n modes, matching the
    single-chip kernel). The graph's edge arrays must be arranged by
    `partition_edges_by_sender(g, num_shards)` so shard p's slice holds
    exactly the edges whose sender is in node block p.

    Returns (schur_graph, removed_count, overflow_flag). The output keeps
    the sender-block arrangement (each shard's slice still holds only edges
    of its node block) but is NOT coalesced across duplicate survivors of
    the final round; run `core.graph.coalesce` on it (or keep feeding it to
    shard-local consumers — SpMM is insensitive to duplicates since
    segment-sum adds them).

    Static per-shard capacities (`slack * local_edges` pool; per-dest
    routing buffers sized from it) can overflow on skewed graphs — a hub
    column whose emissions all route to one shard. With
    `max_escalations > 0` an overflowed call re-runs with doubled
    `slack` (doubling pool and routing capacities) up to that many
    times, the sharded analogue of the single-chip compact=False
    escalation; each escalation compiles a new program, so steady-state
    callers should pass the sticking slack directly.
    """
    if o_v not in ("random", "degree", "coarsen"):
        raise ValueError(f"unsupported o_v {o_v!r}")
    if o_n not in ("asc", "desc", "random"):
        raise ValueError(f"unsupported o_n {o_n!r}")
    if o_v == "coarsen":
        o_n = "random"  # CoarseningPreconditioner forces o_n (cc:830-833)
    n = g.num_nodes
    t = jnp.minimum(jnp.asarray(num_remove, jnp.int32), n - 1)
    s, r, w, removed, _rounds, overflow = _eliminate_sharded_jit(
        g.senders, g.receivers, g.weights, key, t, n, mesh=mesh, axis=axis,
        o_v=o_v, o_n=o_n, subiters=subiters, slack=slack)
    for _ in range(max_escalations):
        if not bool(jax.device_get(overflow)):
            break
        slack *= 2
        s, r, w, removed, _rounds, overflow = _eliminate_sharded_jit(
            g.senders, g.receivers, g.weights, key, t, n, mesh=mesh,
            axis=axis, o_v=o_v, o_n=o_n, subiters=subiters, slack=slack)
    out = Graph(senders=s, receivers=r, weights=w, num_nodes=n, x=g.x,
                node_mask=g.node_mask)
    return out, removed, overflow
