"""Build model params WITHOUT a relay-compiled ``model.init``.

Through the axon relay, jitting ``model.init`` costs ~2 min of compile +
first-execution load per script.  Two alternatives, used by every bench/
profile/quality script:

* :func:`host_built_params` — ``jax.eval_shape`` traces init without
  compiling anything, then the leaves are filled with host-side numpy
  randoms.  Weight VALUES are runtime arguments to the compiled program,
  so they cannot change its timing — right for throughput measurement,
  wrong for quality measurement (the distributions are not the real
  initializers').
* :func:`cpu_init_params` — runs the REAL flax initializers on the host
  CPU backend (seconds), then transfers the tree to the default device.
  Distribution-faithful — required for quantization-quality measurement
  (scripts/quant_db*.py), where the error depends on the weight and
  activation distributions.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["host_built_params", "cpu_init_params"]


def host_built_params(init_fn, *init_args, scale=0.05, seed=1):
    """Shape-trace ``init_fn(*init_args)`` and fill leaves with
    ``scale * N(0,1)`` host numpy (no compile, no relay)."""
    shapes = jax.eval_shape(init_fn, *init_args)
    prng = np.random.RandomState(seed)
    return jax.tree_util.tree_map(
        lambda s: jnp.asarray(scale * prng.standard_normal(s.shape),
                              s.dtype), shapes)


def cpu_init_params(init_fn, *init_args, seed=0, to_default_device=True):
    """Run the real initializers on the CPU backend; optionally move the
    tree to the default device."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = jax.jit(init_fn, device=cpu)(jax.random.PRNGKey(seed),
                                              *init_args)
    if to_default_device and jax.devices()[0] is not cpu:
        params = jax.device_put(params, jax.devices()[0])
    return params
