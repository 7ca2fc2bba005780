"""Classification metrics, jittable (used inside the linear-probe scan).

Parity targets: sklearn `f1_score(average="micro"/"macro")` and
`accuracy_score` as called by the reference evaluators
(`node_shared.py:209-224`). For single-label multiclass, micro-F1 equals
accuracy; macro-F1 averages per-class F1 over classes present in y_true.
"""

from __future__ import annotations

import jax.numpy as jnp


def accuracy(y_true, y_pred):
    return jnp.mean((y_true == y_pred).astype(jnp.float32))


def f1_micro(y_true, y_pred):
    return accuracy(y_true, y_pred)


def f1_macro(y_true, y_pred, num_classes: int):
    oh_t = jnp.eye(num_classes)[y_true]  # [n, c]
    oh_p = jnp.eye(num_classes)[y_pred]
    tp = jnp.sum(oh_t * oh_p, axis=0)
    fp = jnp.sum((1 - oh_t) * oh_p, axis=0)
    fn = jnp.sum(oh_t * (1 - oh_p), axis=0)
    denom = 2 * tp + fp + fn
    f1 = jnp.where(denom > 0, 2 * tp / jnp.maximum(denom, 1.0), 0.0)
    present = jnp.sum(oh_t, axis=0) > 0
    return jnp.sum(jnp.where(present, f1, 0.0)) / jnp.maximum(
        jnp.sum(present.astype(jnp.float32)), 1.0)
