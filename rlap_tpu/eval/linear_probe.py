"""Linear-probe evaluation: full-batch logistic regression.

Reference `LREvaluator` (duplicated across recipes, e.g.
`node_shared.py:163-230`): Adam(lr=0.01), NLL on log-softmax, 2000 epochs,
evaluate every 20, select the test metrics at the best validation micro-F1.
Here the entire probe — training scan, periodic eval, best-val bookkeeping —
is ONE jitted `lax.scan`, so a 2000-epoch probe is a single device program
instead of 2000 host steps.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rlap_tpu.eval.metrics import accuracy, f1_macro, f1_micro


@functools.partial(jax.jit, static_argnames=("num_classes", "num_epochs",
                                             "test_interval", "lr", "wd"))
def _probe(x, y, train_idx, test_idx, valid_idx, key,
           num_classes: int, num_epochs: int = 2000, lr: float = 0.01,
           wd: float = 0.0, test_interval: int = 20):
    in_dim = x.shape[1]
    # xavier-uniform weight, zero bias (node_dedicated.py:56-60)
    lim = jnp.sqrt(6.0 / (in_dim + num_classes))
    w = jax.random.uniform(key, (in_dim, num_classes), x.dtype, -lim, lim)
    b = jnp.zeros((num_classes,), x.dtype)
    params = (w, b)
    tx = optax.chain(optax.add_decayed_weights(wd),
                     optax.adam(lr))  # torch.Adam(weight_decay=wd) semantics
    opt_state = tx.init(params)

    xt, yt = x[train_idx], y[train_idx]
    xs, ys = x[test_idx], y[test_idx]
    xv, yv = x[valid_idx], y[valid_idx]

    def loss_fn(p):
        logits = xt @ p[0] + p[1]
        return -jnp.mean(
            jnp.take_along_axis(jax.nn.log_softmax(logits), yt[:, None],
                                axis=1))

    def epoch(carry, _):
        params, opt_state, best = carry
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, best), None

    def eval_block(carry, _):
        params, opt_state, best = carry
        (params, opt_state, best), _ = jax.lax.scan(
            epoch, (params, opt_state, best), None, length=test_interval)
        pred_v = jnp.argmax(xv @ params[0] + params[1], axis=1)
        val_micro = f1_micro(yv, pred_v)
        pred_s = jnp.argmax(xs @ params[0] + params[1], axis=1)
        test_micro = f1_micro(ys, pred_s)
        test_macro = f1_macro(ys, pred_s, num_classes)
        test_acc = accuracy(ys, pred_s)
        better = val_micro > best["val_micro"]
        best = {
            "val_micro": jnp.where(better, val_micro, best["val_micro"]),
            "micro_f1": jnp.where(better, test_micro, best["micro_f1"]),
            "macro_f1": jnp.where(better, test_macro, best["macro_f1"]),
            "accuracy": jnp.where(better, test_acc, best["accuracy"]),
        }
        return (params, opt_state, best), None

    best0 = {k: jnp.zeros((), x.dtype)
             for k in ("val_micro", "micro_f1", "macro_f1", "accuracy")}
    (params, opt_state, best), _ = jax.lax.scan(
        eval_block, (params, opt_state, best0), None,
        length=num_epochs // test_interval)
    return best


def lr_evaluate(x, y, split, num_classes: int, num_epochs: int = 2000,
                lr: float = 0.01, wd: float = 0.0, test_interval: int = 20,
                seed: int = 0) -> Dict[str, float]:
    """Run the probe; returns {'micro_f1', 'macro_f1', 'accuracy'}."""
    x = jnp.asarray(x)
    y = jnp.asarray(y, jnp.int32)
    best = _probe(x, y,
                  jnp.asarray(split["train"], jnp.int32),
                  jnp.asarray(split["test"], jnp.int32),
                  jnp.asarray(split["valid"], jnp.int32),
                  jax.random.PRNGKey(seed),
                  num_classes=num_classes, num_epochs=num_epochs,
                  lr=lr, wd=wd, test_interval=test_interval)
    return {k: float(v) for k, v in best.items() if k != "val_micro"}
