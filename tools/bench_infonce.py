"""Fused (Pallas) vs row-blocked InfoNCE on the GRACE train step.

VERDICT.md item 4: bench train-step time fused vs blocked at n=20k, d=256
on the TPU. Prints both per-step times and the speedup.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from rlap_tpu.utils.compile_cache import setup_compilation_cache
    setup_compilation_cache()

    import jax.numpy as jnp
    import optax

    from rlap_tpu.data.synthetic import barabasi_albert
    from rlap_tpu.models.common import torch_adam
    from rlap_tpu.models.grace import GRACE
    from rlap_tpu.objectives.contrast import DualBranchContrast

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    d = 256
    print(f"devices: {jax.devices()}, n={n}, d={d}", flush=True)

    g = barabasi_albert(n, 8, seed=0)
    g = g.replace(x=jax.random.normal(jax.random.PRNGKey(1), (n, d),
                                      jnp.float32))
    model = GRACE(hidden_dim=d, num_layers=2, proj_dim=d)
    params = model.init(jax.random.PRNGKey(0), g, g)["params"]
    tx = torch_adam(1e-3, 1e-5)
    opt_state = tx.init(params)

    results = {}
    for loss_name in ("infonce_batched", "infonce_fused"):
        contrast = DualBranchContrast(loss=loss_name, mode="L2L", tau=0.2,
                                      block_size=1024)

        @jax.jit
        def step(params, opt_state, g1, g2):
            def loss_fn(p):
                h1, h2 = model.apply({"params": p}, g1, g2)
                return contrast(h1=h1, h2=h2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        t0 = time.perf_counter()
        p2, o2, loss = step(params, opt_state, g, g)
        lv = float(loss)
        print(f"{loss_name}: first step (compile) "
              f"{time.perf_counter()-t0:.1f}s loss={lv:.4f}", flush=True)
        reps = 5
        t0 = time.perf_counter()
        for i in range(reps):
            p2, o2, loss = step(p2, o2, g, g)
            lv = float(loss)  # materialize per call (axon timing gotcha)
        dt = (time.perf_counter() - t0) / reps * 1e3
        results[loss_name] = dt
        print(f"{loss_name}: {dt:.1f} ms/step", flush=True)

    speedup = results["infonce_batched"] / results["infonce_fused"]
    print(f"fused speedup over blocked: {speedup:.2f}x", flush=True)


if __name__ == "__main__":
    main()
