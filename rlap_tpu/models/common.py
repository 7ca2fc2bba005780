"""Shared trainer plumbing for the five GCL recipes."""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax


def torch_adam(lr: float, weight_decay: float = 0.0):
    """torch.optim.Adam semantics: L2 decay added to the gradient *before*
    the moment updates (what every reference recipe uses)."""
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay),
                           optax.adam(lr))
    return optax.adam(lr)


class EarlyStopper:
    """Stop when train loss hasn't improved for `tolerance` epochs
    (`node_shared.py:510-528`)."""

    def __init__(self, tolerance: int = 50):
        self.tolerance = tolerance
        self.best = float("inf")
        self.count = 0

    def update(self, loss: float) -> bool:
        if loss < self.best:
            self.best = loss
            self.count = 0
        else:
            self.count += 1
        return self.count >= self.tolerance


def make_union_batches(graphs, batch_size: int, shuffle_seed: int = 0):
    """Host-side: shuffle and pad graphs into fixed-capacity block-diagonal
    unions so every batch compiles to the same program. The per-batch union
    is the reference's DataLoader semantics (`graph_shared.py:152-169`):
    augmentors see ONE disjoint-union graph per batch. Shared by the
    GraphCL and BGRL trainers."""
    import numpy as np

    from rlap_tpu.core import graph as G

    # shuffle-INDEPENDENT capacities: the worst any chunk can need is the
    # sum of the `batch_size` largest graphs, so every epoch/shuffle
    # reuses the same compiled step (per-chunk exact caps recompiled the
    # train step whenever a permutation nudged a chunk's node/edge sum —
    # which dominated graph-recipe wall time on CPU and costs minutes per
    # shape over a remote-TPU tunnel; bounded padding buys compile reuse)
    def cap(sizes, mult):
        worst = sum(sorted(sizes, reverse=True)[:batch_size])
        return max(mult, (worst + mult - 1) // mult * mult)

    ncap = cap([g.num_nodes for g in graphs], 128)
    ecap = cap([int(g.num_edges) for g in graphs], 256)

    idx = np.random.default_rng(shuffle_seed).permutation(len(graphs))
    batches = []
    for start in range(0, len(idx), batch_size):
        chunk = [graphs[int(i)] for i in idx[start:start + batch_size]]
        batch, seg = G.block_diagonal(chunk, node_capacity=ncap,
                                      edge_capacity=ecap)
        batches.append((batch, seg, len(chunk)))
    return batches


def checkpointed_fit(trainer, g, max_epochs: int, tolerance: int,
                     verbose: bool = False, checkpoint_dir=None,
                     checkpoint_every: int = 100, log_every: int = 50):
    """Shared fit loop with early stopping and optional orbax
    checkpoint/resume. Trainer protocol: `train_epoch(g) -> float`
    (or `train_epoch(g, epoch)` when per-epoch batch shuffling needs the
    epoch index — detected by signature), `_ensure_init(g)`, and
    `params`/`opt_state`/`key` attributes; trainers with additional
    learned state (EMA targets, BatchNorm stats) list the attribute
    names in `_ckpt_extra` and they ride in the checkpoint too. The
    checkpoint carries params, opt state, the RNG key, and the
    early-stop state (including whether the stop already fired, so a
    resumed run never trains past the recorded stop) — a killed run
    restarts where it left off and reproduces the uninterrupted run
    exactly."""
    import inspect

    import jax.numpy as jnp
    import numpy as np

    stopper = EarlyStopper(tolerance)
    extra_attrs = tuple(getattr(trainer, "_ckpt_extra", ()))
    wants_epoch = "epoch" in inspect.signature(
        trainer.train_epoch).parameters

    def run_epoch(epoch):
        if wants_epoch:
            return trainer.train_epoch(g, epoch=epoch)
        return trainer.train_epoch(g)

    def state(epoch, stopped):
        best = stopper.best if np.isfinite(stopper.best) else 1e30
        st = dict(params=trainer.params, opt_state=trainer.opt_state,
                  key=jnp.asarray(trainer.key),
                  epoch=jnp.asarray(epoch, jnp.int32),
                  best=jnp.asarray(best, jnp.float32),
                  count=jnp.asarray(stopper.count, jnp.int32),
                  stopped=jnp.asarray(stopped, jnp.int32))
        for name in extra_attrs:
            st[name] = getattr(trainer, name)
        return st

    start_epoch = 0
    if checkpoint_dir is not None:
        from rlap_tpu.utils.checkpoint import (latest_step,
                                               restore_checkpoint)

        step = latest_step(checkpoint_dir)
        if step is not None:
            trainer._ensure_init(g)
            st = restore_checkpoint(checkpoint_dir, state(0, False),
                                    step=step)
            trainer.params = st["params"]
            trainer.opt_state = st["opt_state"]
            trainer.key = jnp.asarray(st["key"])
            for name in extra_attrs:
                setattr(trainer, name, st[name])
            stopper.best = float(st["best"])
            stopper.count = int(st["count"])
            start_epoch = int(st["epoch"]) + 1
            if bool(int(st["stopped"])):
                start_epoch = max_epochs  # run already finished

    losses = []
    for epoch in range(start_epoch, max_epochs):
        loss = run_epoch(epoch)
        losses.append(loss)
        if verbose and epoch % log_every == 0:
            print(f"epoch {epoch}: loss {loss:.4f}")
        stop = stopper.update(loss)
        if checkpoint_dir is not None and (
                stop or epoch == max_epochs - 1
                or (epoch + 1) % checkpoint_every == 0):
            from rlap_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(checkpoint_dir, state(epoch, stop), step=epoch)
        if stop:
            break
    return losses
